import os, time
import numpy as np, jax, jax.numpy as jnp
from _prof3 import fused, poses0, disps0, damping0, nets0, target0
st = fused(poses0, disps0, damping0, nets0, target0)
jax.block_until_ready(st[0])
with jax.profiler.trace("/tmp/jtrace"):
    for _ in range(3):
        st = fused(*st[:5])
    jax.block_until_ready(st[0])
print("done")
