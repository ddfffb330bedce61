"""droid.pth (torch) -> flax parameter conversion.

Ingests the reference's trained checkpoint so ATE parity is testable without
retraining (SURVEY.md §7 build step 5).  Handles:
- the "module." DataParallel prefix strip (reference droid.py:63-64)
- the 3->2 output-channel slice of the update weight/delta heads
  (reference droid.py:66-70)
- OIHW -> HWIO conv kernel layout
"""
import numpy as np


def _conv(w, b=None):
    out = {"kernel": np.transpose(np.asarray(w), (2, 3, 1, 0))}
    if b is not None:
        out["bias"] = np.asarray(b)
    return out


def _encoder_map(prefix):
    """torch key prefix -> flax path fragments for a BasicEncoder."""
    m = {f"{prefix}.conv1": ("conv1",), f"{prefix}.conv2": ("conv2",)}
    for L in (1, 2, 3):
        for K in (0, 1):
            base = f"{prefix}.layer{L}.{K}"
            blk = f"layer{L}_{K}"
            m[f"{base}.conv1"] = (blk, "conv1")
            m[f"{base}.conv2"] = (blk, "conv2")
            m[f"{base}.downsample.0"] = (blk, "downsample")
    return m


_UPDATE_MAP = {
    "update.corr_encoder.0": ("corr_enc1",),
    "update.corr_encoder.2": ("corr_enc2",),
    "update.flow_encoder.0": ("flow_enc1",),
    "update.flow_encoder.2": ("flow_enc2",),
    "update.weight.0": ("weight1",),
    "update.weight.2": ("weight2",),
    "update.delta.0": ("delta1",),
    "update.delta.2": ("delta2",),
    "update.gru.convzr": ("gru", "convzr"),
    "update.gru.convq": ("gru", "convq"),
    "update.gru.w": ("gru", "w"),
    "update.gru.convzr_glo": ("gru", "convzr_glo"),
    "update.gru.convq_glo": ("gru", "convq_glo"),
    "update.agg.conv1": ("agg", "conv1"),
    "update.agg.conv2": ("agg", "conv2"),
    "update.agg.eta.0": ("agg", "eta0"),
    "update.agg.upmask.0": ("agg", "upmask0"),
}

# heads trained with an extra channel; inference uses the first two
# (reference droid.py:66-70)
_SLICED_HEADS = ("update.weight.2", "update.delta.2")


def convert_torch_checkpoint(state_dict):
    """torch state_dict (tensors or numpy) -> flax params pytree.

    Returns {"params": {...}} matching DroidNet's parameter structure.
    """
    sd = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    for head in _SLICED_HEADS:
        if f"{head}.weight" in sd and sd[f"{head}.weight"].shape[0] == 3:
            sd[f"{head}.weight"] = sd[f"{head}.weight"][:2]
            sd[f"{head}.bias"] = sd[f"{head}.bias"][:2]

    # the GRU's z/r convs share their input; the flax module runs them as
    # ONE conv with stacked output channels (models/gru.py), numerically
    # identical — stack the reference weights along the OIHW out axis
    for a, b, out in (
        ("update.gru.convz", "update.gru.convr", "update.gru.convzr"),
        ("update.gru.convz_glo", "update.gru.convr_glo", "update.gru.convzr_glo"),
    ):
        if f"{a}.weight" in sd and f"{b}.weight" in sd:
            sd[f"{out}.weight"] = np.concatenate(
                [sd.pop(f"{a}.weight"), sd.pop(f"{b}.weight")], axis=0
            )
            sd[f"{out}.bias"] = np.concatenate(
                [sd.pop(f"{a}.bias"), sd.pop(f"{b}.bias")], axis=0
            )

    mapping = {}
    for prefix in ("fnet", "cnet"):
        for tk, path in _encoder_map(prefix).items():
            mapping[tk] = (prefix,) + path
    for tk, path in _UPDATE_MAP.items():
        mapping[tk] = ("update",) + path

    params = {}
    unused = []
    for key, val in sd.items():
        if not key.endswith(".weight") and not key.endswith(".bias"):
            unused.append(key)
            continue
        base, kind = key.rsplit(".", 1)
        if base not in mapping:
            unused.append(key)
            continue
        path = mapping[base]
        node = params
        for p in path:
            node = node.setdefault(p, {})
        if kind == "weight":
            node["kernel"] = np.transpose(val, (2, 3, 1, 0))
        else:
            node["bias"] = val

    if unused:
        import warnings

        warnings.warn(f"unconverted checkpoint keys: {sorted(unused)[:10]}...")
    return {"params": params}


def load_torch_checkpoint(path):
    """Load a droid.pth-style checkpoint with torch (CPU) and convert."""
    import torch

    state_dict = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_checkpoint(state_dict)
