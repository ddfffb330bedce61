import jax, jax.numpy as jnp
x = jnp.ones((1024, 1024))
f = jax.jit(lambda x: jnp.tanh(x @ x))
jax.block_until_ready(f(x))
with jax.profiler.trace("/tmp/jtrace"):
    jax.block_until_ready(f(x))
print("ok")
