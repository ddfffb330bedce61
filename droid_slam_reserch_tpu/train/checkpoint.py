"""Training checkpoints with full optimizer state.

The reference saves model weights only, every 10k steps
(reference train.py:134-136), losing Adam moments and the OneCycle
schedule position on preemption — which on TPU pods is routine, not
exceptional (SURVEY.md §5 asks the TPU build to formalize this).  Here a
checkpoint carries params + the full optax state (including the schedule
step count buried in ScaleByAdamState/clip chains) + the loop step, so a
resumed run continues bit-exactly (tested: tests/test_train_dynamic.py
resume-equivalence).
"""
import jax
import jax.numpy as jnp
import numpy as np


def _obj(x):
    arr = np.empty((), dtype=object)
    arr[()] = x
    return arr


def save_ckpt(path, params, opt_state, step):
    """Write params + optimizer state + step to an npz."""
    np.savez(
        path,
        params=_obj(jax.tree_util.tree_map(np.asarray, params)),
        opt_state=_obj(jax.tree_util.tree_map(np.asarray, opt_state)),
        step=np.int64(step),
    )


def load_ckpt(path):
    """Returns (params, opt_state | None, step).

    Accepts both full checkpoints and the reference-style params-only npz
    (opt_state comes back None and step 0 — a warm start, not a resume).
    """
    data = np.load(path, allow_pickle=True)
    params = jax.tree_util.tree_map(jnp.asarray, data["params"].item())
    opt_state = None
    if "opt_state" in data.files:
        opt_state = jax.tree_util.tree_map(
            jnp.asarray, data["opt_state"].item()
        )
    step = int(data["step"]) if "step" in data.files else 0
    return params, opt_state, step
