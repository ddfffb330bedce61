"""Measure VPU primitive rates in Pallas: select chains, static rolls,
sublane-offset slices — the building blocks of the select-tree gather."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BP = 128
H, W = 56, 128  # padded L0 block


def bench(name, make, reps=30):
    try:
        f, args, elems_per_call = make()
        out = f(*args)
        jax.block_until_ready(out)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}")
        return
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e6:8.1f} us/call  -> {elems_per_call/dt/1e12:.2f} T elem/s")


key = jax.random.PRNGKey(0)

def pc(kernel, out_shape, n_in):
    return lambda *a: pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_in,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(*a)


# 1) chain of 16 selects on [BP, H, W] f32 (cond per-row broadcast)
def mk_sel():
    def kernel(x_ref, c_ref, o_ref):
        x = x_ref[:]
        c = c_ref[:]  # [BP, 1, 1] f32
        acc = x
        for i in range(16):
            acc = jnp.where(c > float(i) / 16.0, acc, x * 0.5)
        o_ref[:] = acc
    x = jax.random.normal(key, (BP, H, W), jnp.float32)
    c = jax.random.uniform(key, (BP, 1, 1))
    f = jax.jit(pc(kernel, jax.ShapeDtypeStruct((BP, H, W), jnp.float32), 2))
    return f, (x, c), 16 * BP * H * W


# 2) chain of 16 fma on same shape (pure compute reference)
def mk_fma():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        acc = x
        for i in range(16):
            acc = acc * 1.0001 + x
        o_ref[:] = acc
    x = jax.random.normal(key, (BP, H, W), jnp.float32)
    f = jax.jit(pc(kernel, jax.ShapeDtypeStruct((BP, H, W), jnp.float32), 1))
    return f, (x,), 16 * BP * H * W


# 3) 8 static sublane-offset slices (aligned 8) + add
def mk_slice8():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        acc = x[:, 0:16]
        for off in (8, 16, 24, 32, 40):
            acc = acc + x[:, off:off + 16]
        o_ref[:] = acc
    x = jax.random.normal(key, (BP, H, W), jnp.float32)
    f = jax.jit(pc(kernel, jax.ShapeDtypeStruct((BP, 16, W), jnp.float32), 1))
    return f, (x,), 5 * BP * 16 * W


# 4) unaligned sublane slices (offsets 1..5) + add
def mk_slice_unaligned():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        acc = x[:, 0:16]
        for off in (1, 2, 3, 4, 5):
            acc = acc + x[:, off:off + 16]
        o_ref[:] = acc
    x = jax.random.normal(key, (BP, H, W), jnp.float32)
    f = jax.jit(pc(kernel, jax.ShapeDtypeStruct((BP, 16, W), jnp.float32), 1))
    return f, (x,), 5 * BP * 16 * W


# 5) static lane rolls chain (8 rolls on [BP, 8, 128])
def mk_roll():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        acc = x
        for s in (1, 2, 4, 8, 16, 32, 64, 1):
            acc = acc + pltpu.roll(x, s, 2)
        o_ref[:] = acc
    x = jax.random.normal(key, (BP, 8, 128), jnp.float32)
    f = jax.jit(pc(kernel, jax.ShapeDtypeStruct((BP, 8, 128), jnp.float32), 1))
    return f, (x,), 8 * BP * 8 * 128


# 6) y select-tree sketch on padded [BP, 56, 128]: aligned tree (3 stages)
#    + fine rolls (3 stages), measuring a realistic full y-stage
def mk_ytree():
    def kernel(x_ref, s_ref, o_ref):
        x = x_ref[:]              # [BP, 56, 128]
        s = s_ref[:]              # [BP, 1, 1] int32 window start in [0, 48]
        c1 = (s >= 16).astype(jnp.float32)
        t1 = jnp.where(c1 > 0, x[:, 16:56], x[:, 0:40])      # 40 rows, R 32
        s1 = s - 16 * c1.astype(jnp.int32)
        c2 = (s1 >= 16).astype(jnp.float32)
        t2 = jnp.where(c2 > 0, t1[:, 16:40], t1[:, 0:24])    # 24 rows, R 16
        s2 = s1 - 16 * c2.astype(jnp.int32)
        c3 = (s2 >= 8).astype(jnp.float32)
        t3 = jnp.where(c3 > 0, t2[:, 8:24], t2[:, 0:16])     # 16 rows, R 8
        s3 = s2 - 8 * c3.astype(jnp.int32)
        # fine: rolls along sublanes by 4, 2, 1
        c4 = (s3 >= 4).astype(jnp.float32)
        t4 = jnp.where(c4 > 0, pltpu.roll(t3, 12, 1), t3)
        s4 = s3 - 4 * c4.astype(jnp.int32)
        c5 = (s4 >= 2).astype(jnp.float32)
        t5 = jnp.where(c5 > 0, pltpu.roll(t4, 14, 1), t4)
        s5 = s4 - 2 * c5.astype(jnp.int32)
        c6 = (s5 >= 1).astype(jnp.float32)
        t6 = jnp.where(c6 > 0, pltpu.roll(t5, 15, 1), t5)
        o_ref[:] = t6[:, 0:8]
    x = jax.random.normal(key, (BP, 56, 128), jnp.float32)
    s = jax.random.randint(key, (BP, 1, 1), 0, 49).astype(jnp.int32)
    f = jax.jit(pc(kernel, jax.ShapeDtypeStruct((BP, 8, 128), jnp.float32), 2))
    return f, (x, s), BP * 56 * 128  # report as one volume pass


bench("16-select chain [512,56,128]", mk_sel)
bench("16-fma chain [512,56,128]", mk_fma)
bench("aligned sublane slices+add", mk_slice8)
bench("unaligned sublane slices+add", mk_slice_unaligned)
bench("8 static lane rolls [512,8,128]", mk_roll)
bench("y select-tree full stage [512,56,128]", mk_ytree)

# correctness of the y-tree: windows of 8 rows starting at s
def ytree_ref(x, s):
    out = np.zeros((BP, 8, 128), np.float32)
    for p in range(BP):
        out[p] = x[p, s[p, 0, 0]: s[p, 0, 0] + 8]
    return out

f, (x, s), _ = mk_ytree()
got = np.asarray(f(x, s))
ref = ytree_ref(np.asarray(x), np.asarray(s))
print("y-tree max err:", np.abs(got - ref).max())
