"""Is bf16 elementwise math actually 2x f32 on the VPU? (VERDICT r3 #8)

A long dependent chain of mul+add on a full-VMEM tile, f32 vs bf16.  If
Mosaic doesn't pack 2 bf16 per 32-bit lane, the Cornell-megakernel bf16
shading experiment is dead on arrival — this probe decides in 2 minutes.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

N_OPS = 512
ROWS, COLS = 256, 128


def make_kernel(dtype):
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        c = jnp.asarray(1.0000001, dtype)

        def body(i, v):
            return v * c + jnp.asarray(1e-7, dtype)

        o_ref[:] = lax.fori_loop(0, N_OPS, body, x, unroll=True)

    return kernel


def run(dtype, rows):
    x = jnp.ones((rows, COLS), dtype)
    f = pl.pallas_call(
        make_kernel(dtype),
        out_shape=jax.ShapeDtypeStruct((rows, COLS), dtype),
    )
    xs = [x * (1.0 + 1e-6 * i) for i in range(21)]
    jax.block_until_ready(f(xs[-1]))
    t0 = time.perf_counter()
    outs = [f(xi) for xi in xs[:20]]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / 20
    ops = rows * COLS * N_OPS * 2  # mul+add
    print(f"{dtype.__name__:10s} rows={rows}: {dt * 1e6:8.1f} us/call, "
          f"{ops / dt / 1e12:6.2f} Top/s")
    return dt


f32 = run(jnp.float32, ROWS)
bf16 = run(jnp.bfloat16, ROWS * 2)  # same byte volume, 2x elements
print(f"bf16 elements/s vs f32: {2 * f32 / bf16:.2f}x")
