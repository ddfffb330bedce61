import os
os.environ["JAX_PLATFORMS"]="cpu"
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_platforms","cpu")
from droid_slam_reserch_tpu.ops.corr import (
    build_pyramid_flat, corr_volume_flat, corr_lookup_pyramid_flat,
    pad_pyramid_flat, window_bases, extract_windows, corr_lookup_windows,
    window_drift_ok, _WPAD, _WWIN)
E, C = 2, 32
key = jax.random.PRNGKey(7)
h, w = 16, 24
f1 = jax.random.normal(key, (E, h, w, C))
f2 = jax.random.normal(jax.random.fold_in(key, 1), (E, h, w, C))
vol = corr_volume_flat(f1, f2)
pyr = build_pyramid_flat(vol, num_levels=4)
padded, meta = pad_pyramid_flat(pyr)
P = h*w
gx, gy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32), indexing="xy")
grid = jnp.stack([gx, gy], -1).reshape(1, P, 2)
coords0 = grid + jax.random.uniform(key, (E, P, 2), minval=-3.0, maxval=3.0)
bases = window_bases(coords0, meta)
wins = extract_windows(padded, meta, bases)
# check extraction directly at level 0
pv = np.asarray(padded[0]); wn = np.asarray(wins[0])
by, bx = np.asarray(bases[0][0]), np.asarray(bases[0][1])
err = 0
for e in range(E):
    for p in range(0, P, 37):
        ref = pv[e, p, by[e,p]:by[e,p]+_WWIN, bx[e,p]:bx[e,p]+_WWIN]
        err = max(err, np.abs(ref - wn[e,p]).max())
print("extraction max err L0:", err)
# lookup parity per level
coords1 = coords0 + jax.random.uniform(jax.random.fold_in(key, 2), (E, P, 2), minval=-1.5, maxval=1.5)
print("driftok", bool(window_drift_ok(coords1, meta, bases)))
full = np.asarray(corr_lookup_pyramid_flat(pyr, coords1))
wind = np.asarray(corr_lookup_windows(wins, meta, bases, coords1))
for l in range(4):
    f = full[..., l*49:(l+1)*49]; wd = wind[..., l*49:(l+1)*49]
    bad = np.abs(f - wd) > 0
    print(f"level {l}: mismatch {bad.sum()}/{bad.size}  maxerr {np.abs(f-wd).max():.4f}")

print("=== off-image case ===")
coords_off = coords0.at[0, 0].set(jnp.array([-50.0, -50.0]))
bases_off = window_bases(coords_off, meta)
wins_off = extract_windows(padded, meta, bases_off)
full = np.asarray(corr_lookup_pyramid_flat(pyr, coords_off))
wind = np.asarray(corr_lookup_windows(wins_off, meta, bases_off, coords_off))
bad = np.argwhere(np.abs(full - wind) > 2e-6)
print("bad:", bad)
for e, p, ch in bad:
    lvl, c0 = ch // 49, ch % 49
    a, b = c0 // 7, c0 % 7
    print(f"e={e} p={p} lvl={lvl} a={a} b={b} full={full[e,p,ch]} wind={wind[e,p,ch]}")
    c = np.asarray(coords_off)[e, p] / (2.0 ** lvl)
    print("  coords lvl:", c, "meta:", meta[lvl], "base:",
          None if bases_off[lvl] is None else (int(bases_off[lvl][0][e,p]), int(bases_off[lvl][1][e,p])))

print("=== manual recompute p=311 lvl0 ===")
import numpy as np
e, p = 0, 311
c = np.asarray(coords_off)[e, p]
volp0 = np.asarray(pyr[0], np.float64)[e, p]     # [16,24] -> wait [H2,W2]
win0 = np.asarray(wins_off[0], np.float64)[e, p]
by0, bx0 = int(bases_off[0][0][e,p]), int(bases_off[0][1][e,p])
x0, y0 = c
xf, yf = np.floor(x0), np.floor(y0)
dx, dy = x0 - xf, y0 - yf
def tap(a, b, vol, ox, oy, H, W):
    val = 0.0
    yc = int(yf) - 3 + b + oy
    xc = int(xf) - 3 + a + ox
    for (w_, yy, xx) in [((1-dy)*(1-dx), yc, xc), ((1-dy)*dx, yc, xc+1),
                          (dy*(1-dx), yc+1, xc), (dy*dx, yc+1, xc+1)]:
        if 0 <= yy < H and 0 <= xx < W:
            val += w_ * vol[yy, xx]
    return val
print("f64 direct vol:", tap(1, 1, volp0, 0, 0, 16, 24))
print("f64 direct win:", tap(1, 1, win0, 8 - bx0, 8 - by0, 24, 24))
print("full f32:", full[e,p,1*7+1], " wind f32:", wind[e,p,1*7+1])
# check window content vs padded at this pixel
pv = np.asarray(padded[0], np.float64)[e, p]
print("win == padded slice:", np.abs(pv[by0:by0+24, bx0:bx0+24] - win0).max())
