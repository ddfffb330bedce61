"""Correlation op tests: volume-vs-fused parity (the corr_index/altcorr seam),
lookup semantics, scaling, differentiability."""
import jax
import jax.numpy as jnp
import numpy as np

from droid_slam_reserch_tpu.ops import (
    corr_volume,
    build_pyramid,
    corr_lookup,
    corr_lookup_pyramid,
    altcorr,
    altcorr_pyramid,
    pool2x_fmap,
)

E, H, W, C = 2, 8, 16, 32
R = 3
RD = 2 * R + 1


def feats(key, h=H, w=W):
    k1, k2 = jax.random.split(key)
    f1 = jax.random.normal(k1, (E, h, w, C))
    f2 = jax.random.normal(k2, (E, h, w, C))
    return f1, f2


def test_volume_scaling():
    f1, f2 = feats(jax.random.PRNGKey(0))
    vol = corr_volume(f1, f2)
    expect = np.einsum("exyc,euvc->exyuv", np.asarray(f1), np.asarray(f2)) / 16.0
    np.testing.assert_allclose(np.asarray(vol) * 16.0, expect * 16.0, atol=1e-3)


def test_integer_lookup_matches_slice():
    f1, f2 = feats(jax.random.PRNGKey(1))
    vol = corr_volume(f1, f2)
    # coords at the pixel itself
    ys, xs = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    coords = jnp.broadcast_to(
        jnp.stack([xs, ys], -1).astype(jnp.float32), (E, H, W, 2)
    )
    out = corr_lookup(vol, coords, radius=R)
    # center channel (a = r, b = r) must equal the diagonal of the volume
    center = out[..., R * RD + R]
    diag = jnp.einsum("exyxy->exy", vol.reshape(E, H, W, H, W))
    np.testing.assert_allclose(np.asarray(center), np.asarray(diag), atol=1e-4)
    # channel (a, b) at integer coords is vol[y, x, y - r + b, x - r + a]
    a, b = 4, 2
    ch = out[..., a * RD + b]
    x1 = np.clip(np.arange(W) - R + a, 0, None)
    y1 = np.arange(H) - R + b
    voln = np.asarray(vol)
    expect = np.zeros((E, H, W))
    for y in range(H):
        for x in range(W):
            yy, xx = y - R + b, x - R + a
            if 0 <= yy < H and 0 <= xx < W:
                expect[:, y, x] = voln[:, y, x, yy, xx]
    np.testing.assert_allclose(np.asarray(ch), expect, atol=1e-4)


def test_fused_matches_volume_lookup():
    """altcorr must be numerically identical to volume + lookup."""
    f1, f2 = feats(jax.random.PRNGKey(2))
    key = jax.random.PRNGKey(3)
    coords = jnp.stack(
        [
            jax.random.uniform(key, (E, H, W)) * (W - 1),
            jax.random.uniform(jax.random.fold_in(key, 1), (E, H, W)) * (H - 1),
        ],
        axis=-1,
    )
    vol = corr_volume(f1, f2)
    out_vol = corr_lookup(vol, coords, radius=R)
    out_fused = altcorr(f1, f2, coords, radius=R)
    np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_vol), atol=1e-4)


def test_pyramid_shapes_and_parity():
    f1, f2 = feats(jax.random.PRNGKey(4))
    coords = jnp.stack(
        [
            jax.random.uniform(jax.random.PRNGKey(5), (E, H, W)) * (W - 1),
            jax.random.uniform(jax.random.PRNGKey(6), (E, H, W)) * (H - 1),
        ],
        axis=-1,
    )
    pyr = build_pyramid(corr_volume(f1, f2), num_levels=3)
    out = corr_lookup_pyramid(pyr, coords, radius=R)
    assert out.shape == (E, H, W, 3 * RD * RD)

    # fused pyramid: feature pooling first vs volume pooling — level 1 of the
    # volume pyramid pools the *volume*, the alt path pools *features*; these
    # differ (pooled dot != dot of pooled), exactly as in the reference.
    f2_pyr = [f2, pool2x_fmap(f2), pool2x_fmap(pool2x_fmap(f2))]
    out_f = altcorr_pyramid(f1, f2_pyr, coords, radius=R)
    assert out_f.shape == (E, H, W, 3 * RD * RD)
    # level 0 must agree exactly
    np.testing.assert_allclose(
        np.asarray(out_f[..., : RD * RD]), np.asarray(out[..., : RD * RD]), atol=1e-4
    )


def test_out_of_bounds_is_zero():
    f1, f2 = feats(jax.random.PRNGKey(7))
    vol = corr_volume(f1, f2)
    coords = jnp.full((E, H, W, 2), -50.0)  # far outside
    out = corr_lookup(vol, coords, radius=R)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_gradients_flow():
    f1, f2 = feats(jax.random.PRNGKey(8))
    coords = jnp.stack(
        [
            jax.random.uniform(jax.random.PRNGKey(9), (E, H, W)) * (W - 1),
            jax.random.uniform(jax.random.PRNGKey(10), (E, H, W)) * (H - 1),
        ],
        axis=-1,
    )

    def loss_vol(v):
        return jnp.sum(corr_lookup(v, coords, radius=R) ** 2)

    g = jax.grad(loss_vol)(corr_volume(f1, f2))
    assert np.all(np.isfinite(np.asarray(g)))

    def loss_fused(a, b):
        return jnp.sum(altcorr(a, b, coords, radius=R) ** 2)

    ga, gb = jax.grad(loss_fused, argnums=(0, 1))(f1, f2)
    assert np.all(np.isfinite(np.asarray(ga)))
    assert np.all(np.isfinite(np.asarray(gb)))


def test_packed_lookup_matches_pyramid():
    """packed_lookup (single batched matmul pair) vs per-level reference,
    including far out-of-bounds coords at every level."""
    from droid_slam_reserch_tpu.ops import pack_pyramid, packed_lookup

    f1, f2 = feats(jax.random.PRNGKey(3))
    pyr = build_pyramid(corr_volume(f1, f2), num_levels=4)
    key = jax.random.PRNGKey(7)
    gx, gy = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    coords = jnp.broadcast_to(jnp.stack([gx, gy], -1)[None], (E, H, W, 2))
    coords = coords + 12.0 * jax.random.normal(key, (E, H, W, 2))

    ref = corr_lookup_pyramid(pyr, coords)
    packed, meta = pack_pyramid(pyr)
    got = packed_lookup(packed, meta, coords)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_windowed_lookup_bit_identical():
    """Window-cached lookup == full lookup (to <= 1 ulp) while taps stay
    in-window — the per-keyframe caching seam used by the fused frontend."""
    from droid_slam_reserch_tpu.ops.corr import (
        build_pyramid_flat, corr_volume_flat, corr_lookup_pyramid_flat,
        pad_pyramid_flat, window_bases, extract_windows,
        corr_lookup_windows, window_drift_ok,
    )
    key = jax.random.PRNGKey(7)
    h, w = 16, 24
    f1 = jax.random.normal(key, (E, h, w, C))
    f2 = jax.random.normal(jax.random.fold_in(key, 1), (E, h, w, C))
    vol = corr_volume_flat(f1.reshape(E, h * w, C).reshape(E, h, w, C), f2)
    pyr = build_pyramid_flat(vol, num_levels=4)
    padded, meta = pad_pyramid_flat(pyr)

    P = h * w
    # coords near the grid (incl. off-image values -> zero taps)
    gx, gy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32), indexing="xy")
    grid = jnp.stack([gx, gy], -1).reshape(1, P, 2)
    coords0 = grid + jax.random.uniform(key, (E, P, 2), minval=-3.0, maxval=3.0)
    bases = window_bases(coords0, meta)
    wins = extract_windows(padded, meta, bases)

    # small drift: must stay bit-identical
    coords1 = coords0 + jax.random.uniform(
        jax.random.fold_in(key, 2), (E, P, 2), minval=-1.5, maxval=1.5)
    assert bool(window_drift_ok(coords1, meta, bases))
    full = corr_lookup_pyramid_flat(pyr, coords1)
    wind = corr_lookup_windows(wins, meta, bases, coords1)
    # identical taps and weights; only FMA reassociation differs (<= 1 ulp)
    np.testing.assert_allclose(np.asarray(full), np.asarray(wind),
                               atol=2e-6, rtol=1e-6)

    # off-image coords are fine too (zero taps on both paths)
    coords_off = coords0.at[0, 0].set(jnp.array([-50.0, -50.0]))
    bases_off = window_bases(coords_off, meta)
    wins_off = extract_windows(padded, meta, bases_off)
    full = corr_lookup_pyramid_flat(pyr, coords_off)
    wind = corr_lookup_windows(wins_off, meta, bases_off, coords_off)
    np.testing.assert_allclose(np.asarray(full), np.asarray(wind),
                               atol=2e-6, rtol=1e-6)

    # large drift must trip the fallback flag
    coords_big = coords0 + 12.0
    assert not bool(window_drift_ok(coords_big, meta, bases))


def test_pmajor_lookup_matches_flat():
    """Pixels-last tree-select lookup == one-hot contraction lookup."""
    from droid_slam_reserch_tpu.ops.corr import (
        build_pyramid_flat, corr_volume_flat, corr_lookup_pyramid_flat,
        build_pyramid_pmajor, corr_lookup_pmajor,
    )
    key = jax.random.PRNGKey(11)
    h, w = 16, 24
    f1 = jax.random.normal(key, (E, h, w, C))
    f2 = jax.random.normal(jax.random.fold_in(key, 1), (E, h, w, C))
    pyr = build_pyramid_flat(corr_volume_flat(f1, f2), num_levels=4)
    padded, meta = build_pyramid_pmajor(f1, f2, num_levels=4)

    P = h * w
    gx, gy = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32), indexing="xy")
    grid = jnp.stack([gx, gy], -1).reshape(1, P, 2)
    # wide coords incl. borders and far off-image
    coords = grid + jax.random.uniform(key, (E, P, 2), minval=-6.0, maxval=6.0)
    coords = coords.at[0, 0].set(jnp.array([-80.0, 55.0]))
    coords = coords.at[0, 1].set(jnp.array([23.9, 15.9]))
    coords = coords.at[1, 2].set(jnp.array([999.0, -999.0]))

    full = corr_lookup_pyramid_flat(pyr, coords)
    pm = corr_lookup_pmajor(padded, meta, coords)
    np.testing.assert_allclose(np.asarray(full), np.asarray(pm),
                               atol=3e-6, rtol=1e-5)


class TestAltcorrBackendStep:
    def test_update_op_step_alt_matches_volume_path(self):
        """The backend's fused-altcorr update step matches the volume-based
        step closely (pooled-feature vs pooled-volume pyramids agree exactly
        at level 0 and only differ by the reference's own AltCorrBlock
        approximation at coarser levels)."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from droid_slam_reserch_tpu.engine.factor_graph import (
            _update_op_step, _update_op_step_alt)
        from droid_slam_reserch_tpu.engine.net_ops import make_applies
        from droid_slam_reserch_tpu.engine.droid import init_params
        from droid_slam_reserch_tpu.utils import DroidConfig
        from droid_slam_reserch_tpu.lie import se3_exp

        h8, w8, T, E = 8, 16, 4, 6
        cfg = DroidConfig(image_size=(h8 * 8, w8 * 8), buffer=T)
        params = init_params(cfg.replace(image_size=(64, 64)), seed=0)
        applies = make_applies("float32")
        key = jax.random.PRNGKey(1)
        poses = se3_exp(0.01 * jax.random.normal(key, (T, 6)))
        disps = jnp.ones((T, h8, w8))
        intr = jnp.broadcast_to(
            jnp.array([w8 * 4.0, w8 * 4.0, w8 / 2.0, h8 / 2.0]), (T, 4))
        fmaps = 0.1 * jax.random.normal(key, (T, 1, h8, w8, 128))
        ii = jnp.array([0, 0, 1, 1, 2, 2], jnp.int32)
        jj = jnp.array([1, 2, 2, 3, 3, 0], jnp.int32)
        cams = jnp.zeros(E, jnp.int32)
        nets_e = jnp.zeros((E, h8, w8, 128))
        inps_e = 0.1 * jax.random.normal(key, (E, h8, w8, 128))
        target = jnp.zeros((E, h8, w8, 2))
        argsv = (applies["update"], params, poses, disps, intr, fmaps,
                 nets_e, inps_e, target, ii, jj, cams, ii,
                 jnp.ones(E, jnp.float32), T)
        ref = _update_op_step(*argsv)
        alt = _update_op_step_alt(*argsv)
        # coords identical; net/target/weight close (coarse-level approx)
        np.testing.assert_allclose(np.asarray(alt[5]), np.asarray(ref[5]),
                                   atol=1e-5)
        for a, r in zip(alt[:3], ref[:3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                       atol=0.05, rtol=0.05)


class TestPallasCorrLookup:
    def test_parity_vs_flat_lookup(self):
        """The fused Pallas P-major lookup must match the XLA one-hot path
        (channel order a*(2r+1)+b, zero outside the image, level-major) —
        reference semantics from correlation_kernels.cu:19-70."""
        import jax
        import jax.numpy as jnp

        from droid_slam_reserch_tpu.ops import corr as C
        from droid_slam_reserch_tpu.ops.pallas_corr import (
            corr_lookup_pmajor_pallas,
        )

        E, H, W, Ch = 2, 16, 24, 16
        P = H * W
        f1 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (E, H, W, Ch))
        f2 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (E, H, W, Ch))
        base = jnp.stack(
            jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                         jnp.arange(H, dtype=jnp.float32), indexing="xy"),
            -1,
        ).reshape(1, P, 2)
        # include out-of-image coords to exercise the zero border
        coords = jnp.broadcast_to(base, (E, P, 2)) + 4.0 * jax.random.normal(
            jax.random.PRNGKey(2), (E, P, 2)
        )

        pyr = C.build_pyramid_flat(C.corr_volume_flat(f1, f2))
        ref = np.asarray(C.corr_lookup_pyramid_flat(pyr, coords))
        padded, meta = C.build_pyramid_pmajor(f1, f2)
        out = np.asarray(
            corr_lookup_pmajor_pallas(padded, meta, coords, block_p=128,
                                      interpret=True)
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_odd_pixel_count_blocks(self):
        """P not divisible by block_p falls back to a smaller divisor."""
        import jax
        import jax.numpy as jnp

        from droid_slam_reserch_tpu.ops import corr as C
        from droid_slam_reserch_tpu.ops.pallas_corr import (
            corr_lookup_pmajor_pallas,
        )

        E, H, W, Ch = 1, 12, 20, 8  # P = 240
        P = H * W
        f1 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (E, H, W, Ch))
        f2 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (E, H, W, Ch))
        coords = jnp.broadcast_to(
            jnp.stack(
                jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                             jnp.arange(H, dtype=jnp.float32), indexing="xy"),
                -1,
            ).reshape(1, P, 2),
            (E, P, 2),
        )
        pyr = C.build_pyramid_flat(C.corr_volume_flat(f1, f2))
        ref = np.asarray(C.corr_lookup_pyramid_flat(pyr, coords))
        padded, meta = C.build_pyramid_pmajor(f1, f2)
        out = np.asarray(
            corr_lookup_pmajor_pallas(padded, meta, coords, block_p=256,
                                      interpret=True)
        )
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)

    def test_window_cache_parity_and_drift(self):
        """Cached-window lookup == full blocked lookup while in-window;
        drift check flags out-of-window coords."""
        import jax
        import jax.numpy as jnp

        from droid_slam_reserch_tpu.ops import corr as C
        from droid_slam_reserch_tpu.ops.pallas_corr import (
            corr_build_pmajor_pallas,
            corr_extract_windows_pallas,
            corr_lookup_blocked_pallas,
            corr_lookup_windows_pallas,
            window_drift_ok_pallas,
        )

        E, H, W, Ch = 2, 16, 24, 16
        P = H * W
        f1 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (E, H, W, Ch))
        f2 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (E, H, W, Ch))
        base = jnp.stack(
            jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                         jnp.arange(H, dtype=jnp.float32), indexing="xy"),
            -1,
        ).reshape(1, P, 2)
        c0 = jnp.broadcast_to(base, (E, P, 2)) + 0.5 * jax.random.normal(
            jax.random.PRNGKey(2), (E, P, 2)
        )

        levels, meta, _ = corr_build_pmajor_pallas(
            f1, f2, dtype=jnp.float32, block_p=128, interpret=True
        )
        wins, bases = corr_extract_windows_pallas(
            levels, meta, c0, interpret=True
        )

        # small drift (bounded below the +-8 px window tolerance): still
        # in-window, outputs must match the full lookup
        c1 = c0 + jax.random.uniform(
            jax.random.PRNGKey(3), (E, P, 2), minval=-4.0, maxval=4.0
        )
        assert bool(window_drift_ok_pallas(bases, meta, c1))
        full = np.asarray(
            corr_lookup_blocked_pallas(levels, meta, c1, interpret=True)
        )
        winned = np.asarray(
            corr_lookup_windows_pallas(wins, bases, meta, c1, interpret=True)
        )
        np.testing.assert_allclose(winned, full, rtol=1e-5, atol=1e-6)

        # large drift: the check must flag it
        c2 = c0 + 12.0
        assert not bool(window_drift_ok_pallas(bases, meta, c2))

    def test_window_drift_out_of_image_interior_base(self):
        """Out-of-image drift with an INTERIOR cached base must trip the
        fallback: the windowed kernel's clip would read real volume rows
        where the full blocked lookup reads the zero border (advisor
        finding, round 3).  Property checked: drift_ok == True implies
        windowed == full, including coords that leave the image."""
        import jax
        import jax.numpy as jnp

        from droid_slam_reserch_tpu.ops.pallas_corr import (
            corr_build_pmajor_pallas,
            corr_extract_windows_pallas,
            corr_lookup_blocked_pallas,
            corr_lookup_windows_pallas,
            window_drift_ok_pallas,
        )

        E, H, W, Ch = 1, 16, 24, 16
        P = H * W
        f1 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (E, H, W, Ch))
        f2 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (E, H, W, Ch))

        # round-0 coords interior (y = 7) -> cached base lands interior
        c0 = jnp.stack(
            [jnp.full((E, P), 12.0), jnp.full((E, P), 7.0)], axis=-1
        )
        levels, meta, _ = corr_build_pmajor_pallas(
            f1, f2, dtype=jnp.float32, block_p=128, interpret=True
        )
        wins, bases = corr_extract_windows_pallas(levels, meta, c0, interpret=True)

        # drift fully above the image: blocked lookup reads border zeros,
        # the cached window (interior base) would clip onto real rows
        c_out = c0.at[..., 1].set(-6.0)
        assert not bool(window_drift_ok_pallas(bases, meta, c_out))
        full = np.asarray(
            corr_lookup_blocked_pallas(levels, meta, c_out, interpret=True)
        )
        winned = np.asarray(
            corr_lookup_windows_pallas(wins, bases, meta, c_out, interpret=True)
        )
        # sanity: the fallback is genuinely needed here
        assert np.abs(winned - full).max() > 1e-4

        # soundness sweep: random drifts (in- and out-of-image); whenever the
        # check says ok, the windowed lookup must equal the full one
        cg = jnp.stack(
            jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                         jnp.arange(H, dtype=jnp.float32), indexing="xy"),
            -1,
        ).reshape(1, P, 2)
        wins_g, bases_g = corr_extract_windows_pallas(
            levels, meta, cg, interpret=True
        )
        for seed in range(6):
            drift = jax.random.uniform(
                jax.random.PRNGKey(10 + seed), (1, P, 2),
                minval=-10.0, maxval=10.0,
            )
            c = cg + drift
            if bool(window_drift_ok_pallas(bases_g, meta, c)):
                fu = np.asarray(
                    corr_lookup_blocked_pallas(levels, meta, c, interpret=True)
                )
                wi = np.asarray(
                    corr_lookup_windows_pallas(
                        wins_g, bases_g, meta, c, interpret=True
                    )
                )
                np.testing.assert_allclose(wi, fu, rtol=1e-5, atol=1e-6)

    def test_fused_build_windows_matches_separate(self):
        """corr_build_windows_pallas == build + extract run separately."""
        import jax
        import jax.numpy as jnp

        from droid_slam_reserch_tpu.ops.pallas_corr import (
            corr_build_pmajor_pallas,
            corr_build_windows_pallas,
            corr_extract_windows_pallas,
        )

        E, H, W, Ch = 2, 8, 16, 8
        P = H * W
        f1 = 0.3 * jax.random.normal(jax.random.PRNGKey(0), (E, H, W, Ch))
        f2 = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (E, H, W, Ch))
        c0 = jnp.broadcast_to(
            jnp.stack(
                jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                             jnp.arange(H, dtype=jnp.float32), indexing="xy"),
                -1,
            ).reshape(1, P, 2),
            (E, P, 2),
        )
        levels, meta, _ = corr_build_pmajor_pallas(
            f1, f2, dtype=jnp.float32, block_p=128, interpret=True
        )
        wins0, bases0 = corr_extract_windows_pallas(
            levels, meta, c0, interpret=True
        )
        levels1, wins1, bases1, meta1, _ = corr_build_windows_pallas(
            f1, f2, c0, dtype=jnp.float32, block_p=128, interpret=True
        )
        assert meta1 == meta
        np.testing.assert_array_equal(np.asarray(bases1), np.asarray(bases0))
        for a, b in zip(levels, levels1):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
        for a, b in zip(wins0, wins1):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-6)
