"""Dataset dispatch (reference data_readers/factory.py:17-81)."""
import os


def dataset_factory(dataset_list, **kwargs):
    """Concatenate training datasets by name."""
    from .tartan import TartanAir

    registry = {"tartan": TartanAir}
    datasets = [registry[name](**kwargs) for name in dataset_list]
    if len(datasets) == 1:
        return datasets[0]
    return ConcatDataset(datasets)


class ConcatDataset:
    def __init__(self, datasets):
        self.datasets = datasets
        self.lengths = [len(d) for d in self.datasets]

    def __len__(self):
        return sum(self.lengths)

    def __getitem__(self, index):
        for d, n in zip(self.datasets, self.lengths):
            if index < n:
                return d[index]
            index -= n
        raise IndexError


def create_datastream(datapath, **kwargs):
    """Per-format stream dispatch by sentinel files (reference factory.py:39-56)."""
    from .eth3d import eth3d_stream
    from .euroc import euroc_stream
    from .tartan import tartan_stream
    from .tum import tum_stream

    if os.path.isdir(os.path.join(datapath, "image_left")):
        return tartan_stream(datapath, **kwargs)
    if os.path.isdir(os.path.join(datapath, "cam0")):
        return euroc_stream(datapath, **kwargs)
    if os.path.isfile(os.path.join(datapath, "calibration.txt")):
        return eth3d_stream(datapath, **kwargs)
    if os.path.isdir(os.path.join(datapath, "rgb")):
        return tum_stream(datapath, **kwargs)
    raise ValueError(f"unrecognized dataset layout: {datapath}")
