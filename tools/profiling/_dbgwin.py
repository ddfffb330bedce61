import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_platforms","cpu")
from droid_slam_reserch_tpu.ops.corr import (
    build_pyramid_flat, corr_volume_flat, corr_lookup_pyramid_flat,
    pad_pyramid_flat, window_bases, extract_windows, corr_lookup_windows,
    window_drift_ok, _WPAD, _WTOL)
E, C = 2, 32
key = jax.random.PRNGKey(7)
h, w = 16, 24
f1 = jax.random.normal(key, (E, h, w, C))
f2 = jax.random.normal(jax.random.fold_in(key, 1), (E, h, w, C))
vol = corr_volume_flat(f1, f2)
pyr = build_pyramid_flat(vol, num_levels=4)
padded, meta = pad_pyramid_flat(pyr)
print("meta", meta)
P = h*w
gx, gy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32), indexing="xy")
grid = jnp.stack([gx, gy], -1).reshape(1, P, 2)
coords0 = grid + jax.random.uniform(key, (E, P, 2), minval=-3.0, maxval=3.0)
bases = window_bases(coords0, meta)
coords1 = coords0 + jax.random.uniform(jax.random.fold_in(key, 2), (E, P, 2), minval=-1.5, maxval=1.5)
R=3
for lvl, ((H2, W2, Hp, Wp), base) in enumerate(zip(meta, bases)):
    if base is None: print(lvl, "full"); continue
    c = coords1 / (2.0 ** lvl)
    ylc = jnp.floor(c[..., 1]).astype(jnp.int32) - R + _WPAD
    xlc = jnp.floor(c[..., 0]).astype(jnp.int32) - R + _WPAD
    by, bx = base
    sy = ylc - by; sx = xlc - bx
    bad_y = ((sy < 0) | (sy > _WTOL)) & (ylc >= -7) & (ylc <= Hp - 1)
    bad_x = ((sx < 0) | (sx > _WTOL)) & (xlc >= -7) & (xlc <= Wp - 1)
    print(lvl, "bad_y", int(bad_y.sum()), "bad_x", int(bad_x.sum()),
          "sy range", int(sy.min()), int(sy.max()), "sx", int(sx.min()), int(sx.max()))
    if bad_y.any():
        i = np.argwhere(np.asarray(bad_y))[0]
        print("  ex y:", c[i[0],i[1]], "ylc", ylc[i[0],i[1]], "by", by[i[0],i[1]])
    if bad_x.any():
        i = np.argwhere(np.asarray(bad_x))[0]
        print("  ex x:", c[i[0],i[1]], "xlc", xlc[i[0],i[1]], "bx", bx[i[0],i[1]])
