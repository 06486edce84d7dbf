"""Probe: does the current Mosaic toolchain legalize int16 vector min/shift/
compare/select in a fori_loop kernel? (Round-2 blocker: arith.minsi on i16.)"""
import functools, time, os, sys
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF16 = 16000

def kern(a_ref, b_ref, o_ref):
    D, B = a_ref.shape
    a = a_ref[:, :]
    b = b_ref[:, :]
    def body(y, st):
        m, i = st
        # the op mix the HMM kernel needs, in i16
        shifted = jnp.concatenate([jnp.full((1, B), INF16, jnp.int16), m[:-1]], axis=0)
        t1 = m + a
        t2 = jnp.where(i < shifted, i, shifted)
        mn = jnp.where(t1 < t2, t1, t2)
        eq = (a == b)
        sel = jnp.where(eq, mn, i + jnp.int16(2))
        s = 1
        u = sel
        while s < 8:
            sh = jnp.concatenate([jnp.full((s, B), INF16, jnp.int16), u[:-s]], axis=0)
            u = jnp.where(u < sh, u, sh)
            s *= 2
        return mn, u
    m, i = jax.lax.fori_loop(0, 50, body, (a, b))
    o_ref[:, :] = jnp.where(m < i, m, i)

@jax.jit
def run(a, b):
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(a, b)

a = jnp.ones((16, 128), jnp.int16)
b = jnp.ones((16, 128), jnp.int16) * 2
t0 = time.time()
out = run(a, b)
out.block_until_ready()
print("i16 kernel OK, compile+run", round(time.time() - t0, 1), "s; out[0,0] =", int(out[0, 0]))
