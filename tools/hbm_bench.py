"""HBM bandwidth characterization for the streamed-Adam roofline.

The streamed untied/VAE-1000 training buckets move ~17.4 MB of Adam
moments per instance-step (ops/train_kernel.adam_streamed) and run at
~21k instance-steps/s = 364 GB/s, which is 44% of the v5e's 819 GB/s
spec sheet number.  This tool measures what the chip's DMA engines
*actually achieve* for that access pattern, so the roofline denominator
is a measured ceiling rather than marketing FLOPs' cousin.

Measured on the target v5e (2026-08-17):

  pattern                                achieved
  -------------------------------------  --------
  mixed read+write stream, 2-slot
    (512,128) bf16 tiles (the kernel's
    exact structure)                     364 GB/s   (46.1 us/step)
  mixed, best over tile sizes 0.5-4 MB,
    2-8 slots, bf16/i32/f32              ~400 GB/s  (plateau)
  read-only stream                       ~290 GB/s
  write-only stream                      ~272 GB/s
  XLA fused elementwise (axpy/copy)      ~125-170 GB/s

Conclusions (README "Roofline utilization"):
  - ~400 GB/s is the practical mixed-R/W DMA ceiling on this chip; it is
    insensitive to tile size, outstanding-transfer count, and dtype.
  - The streamed training kernel's full step (DMA + grad matmuls + Adam
    VPU math + fwd/bwd) takes 47.6 us vs the 46 us DMA-only floor of its
    own stream structure: the kernel is ~97% DMA-bound-optimal, i.e. at
    speed-of-light for its byte count.  Further gains require moving
    fewer bytes, which for exact Adam means changing optimizer state
    semantics (rejected for reference parity, PARITY.md).
  - bf16 moment *math* (vs bf16 storage + f32 math) measured SLOWER
    (61.2 vs 58.4 us/step in the tile-replica microbench): TPU VPU does
    not pack bf16 elementwise ops, so the casts it saves are cheaper
    than the bf16 arithmetic it adds.

Run-to-run variance: +-10-15% after sustained chip load (the same
"chip weather" bench.py's canary gates on); the table above is from a
healthy-chip session.  The plateau structure — mixed ~2x unidirectional,
flat across tile size/slots/dtype, far above XLA fusions — is stable.

Usage: python tools/hbm_bench.py  (runs on the session's real TPU; one
JSON-ish line per pattern).  Reference for the workload: the streamed
moment layout in ops/train_kernel.py:418-472.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 2000
# one step moves this plane in and out, like the untied-1000 bucket's
# two (1024,1024) streamed moment tensors (m and v adjacent)
ROWS, COLS = 1024, 2048


def _stream_kernel(nt, shape, dt, slots, mode):
    """A `mode` stream over an (nt, *shape) HBM buffer through `slots`
    VMEM chunk buffers — the adam_streamed pipeline without the math."""

    def kernel(out_ref, mvh, chunk, sems):
        chunk[...] = jnp.zeros(chunk.shape, dt)

        def io(t, s, out):
            a, b = (chunk.at[s], mvh.at[t]) if out else (mvh.at[t],
                                                         chunk.at[s])
            return pltpu.make_async_copy(a, b, sems.at[s])

        for t in range(min(slots, nt)):     # init HBM (contents junk)
            io(t, t % slots, True).start()
            io(t, t % slots, True).wait()

        def touch(s):
            if len(shape) == 3:
                chunk[s, 0, 0:8, 0:128] = chunk[s, 0, 0:8, 0:128]
            else:
                chunk[s, 0:8, 0:128] = chunk[s, 0:8, 0:128]

        def step_body(step, carry):
            if mode == "mixed":
                for t in range(min(slots, nt)):
                    io(t, t, False).start()
                for t in range(nt):
                    s = t % slots
                    io(t, s, False).wait()
                    touch(s)
                    io(t, s, True).start()
                    io(t, s, True).wait()
                    if t + slots < nt:
                        io(t + slots, s, False).start()
            else:
                out = mode == "write"
                for t in range(min(slots, nt)):
                    io(t, t, out).start()
                for t in range(nt):
                    s = t % slots
                    io(t, s, out).wait()
                    touch(s)
                    if t + slots < nt:
                        io(t + slots, s, out).start()
            return carry

        jax.lax.fori_loop(0, STEPS, step_body, 0)
        if len(shape) == 3:
            out_ref[...] = chunk[0, 0, 0:8, 0:128].astype(jnp.float32)
        else:
            out_ref[...] = chunk[0, 0:8, 0:128].astype(jnp.float32)

    return jax.jit(pl.pallas_call(
        kernel,
        grid=(),
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(jax.ShapeDtypeStruct((8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((nt,) + tuple(shape), dt)),
        scratch_shapes=[pltpu.VMEM((slots,) + tuple(shape), dt),
                        pltpu.SemaphoreType.DMA((slots,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=16 * 1024 * 1024)))


def measure(name, nt, shape, dt, slots, mode):
    f = _stream_kernel(nt, shape, dt, slots, mode)
    np.asarray(f()[0])                       # compile
    t0 = time.perf_counter()
    np.asarray(f()[0])
    us = (time.perf_counter() - t0) / STEPS * 1e6
    nbytes = nt * int(np.prod(shape)) * np.dtype(dt).itemsize
    if mode == "mixed":
        nbytes *= 2
    gbs = nbytes / (us * 1e-6) / 1e9
    print(f"{name:42s} {us:7.2f} us/step  {gbs:6.0f} GB/s", flush=True)
    return gbs


def main():
    # the kernel's exact stream: (2, 512, 128) bf16 m+v tiles, 2 slots
    measure("kernel stream (2-slot (512,128) bf16 m+v)",
            ROWS // 512 * (COLS // 128), (2, 512, 128), jnp.bfloat16,
            2, "mixed")
    # plateau probes: bigger tiles / more slots / other dtypes
    measure("mixed, (2,512,512) bf16 tiles, 2 slots",
            ROWS // 512 * (COLS // 512), (2, 512, 512), jnp.bfloat16,
            2, "mixed")
    measure("mixed, (512,512) i32 tiles, 4 slots",
            8, (512, 512), jnp.int32, 4, "mixed")
    measure("mixed, (512,512) f32 tiles, 4 slots",
            8, (512, 512), jnp.float32, 4, "mixed")
    measure("read-only, (512,512) i32, 4 slots",
            8, (512, 512), jnp.int32, 4, "read")
    measure("write-only, (512,512) i32, 4 slots",
            8, (512, 512), jnp.int32, 4, "write")


if __name__ == "__main__":
    main()
