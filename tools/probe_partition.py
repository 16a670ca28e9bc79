"""De-risking probes for the Pallas streaming radix-partition MSM
(SCALING.md round-4 design; VERDICT r4 #2).

Probe A — scatter-DMA pattern: per input block, 16 async copies of
1/16-block chunks from VMEM to dynamic HBM offsets (the bin-flush
pattern). Measures effective bandwidth incl. per-DMA overhead.

Probe B — one-hot MXU permutation: per block, build a one-hot matrix
from a rank vector (broadcasted_iota == rank) and jnp.dot it with the
row payload (int8) — the in-VMEM shuffle that groups rows by bin.

Usage: python tools/probe_partition.py  (on the TPU)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = int(os.environ.get("BLOCK", "2048"))  # rows per block
ROWB = 128          # payload bytes per row (96 used + pad)
NBINS = 16
CHUNK = B // NBINS  # rows per bin chunk


def probe_scatter_dma(nblocks: int):
    """Input [nblocks*B, ROWB] u8 -> output same size; each block writes
    16 chunks at precomputed dynamic row offsets."""
    total = nblocks * B

    def kernel(offs_ref, in_ref, out_ref, sem):
        def body(i, _):
            # destination offsets are CHUNK-aligned by construction; the
            # hint lets Mosaic prove sublane-tile divisibility
            off = pl.multiple_of(offs_ref[pl.program_id(0), i], CHUNK)
            cp = pltpu.make_async_copy(
                in_ref.at[pl.ds(i * CHUNK, CHUNK), :],
                out_ref.at[pl.ds(off, CHUNK), :],
                sem,
            )
            cp.start()
            cp.wait()
            return 0
        jax.lax.fori_loop(0, NBINS, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((B, ROWB), lambda i, offs: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
    )

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((total, ROWB), jnp.uint8),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, size=(total, ROWB), dtype=np.uint8))
    # offsets: a random permutation of chunk slots (distinct destinations)
    perm = rng.permutation(total // CHUNK).astype(np.int32) * CHUNK
    offs = jnp.asarray(perm.reshape(nblocks, NBINS))

    f = jax.jit(lambda o, v: fn(o, v))
    y = f(offs, x)
    y.block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        y = f(offs, x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    mb = total * ROWB / 1e6
    print(f"[scatter-dma] {nblocks} blocks, {total} rows, {mb:.0f} MB: "
          f"{dt*1e3:.1f} ms  -> {mb/1e3/dt:.1f} GB/s eff, "
          f"{dt/ (nblocks*NBINS) * 1e6:.2f} us/DMA", flush=True)
    # correctness spot check
    ynp = np.asarray(y)
    xnp = np.asarray(x)
    onp = np.asarray(offs)
    blk, i = 3 % nblocks, 5
    src = xnp[blk * B + i * CHUNK: blk * B + i * CHUNK + CHUNK]
    dst = ynp[onp[blk, i]: onp[blk, i] + CHUNK]
    assert (src == dst).all(), "scatter-dma mismatch"


def probe_onehot_mxu(nblocks: int):
    """Per block: one-hot(rank) @ rows — the VMEM permutation."""
    total = nblocks * B

    dt = os.environ.get("ONEHOT_DTYPE", "bf16")

    def kernel(rank_ref, in_ref, out_ref):
        rank = rank_ref[:]                       # [B, 1] i32
        iota = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
        if dt == "int8":
            onehot = (iota == rank.reshape(1, B)).astype(jnp.int8)
            rows = in_ref[:].astype(jnp.int8)
            out_ref[:] = jnp.dot(onehot, rows,
                                 preferred_element_type=jnp.int32).astype(jnp.uint8)
        else:
            # bf16 is exact here: one-hot 0/1 times u8 payloads (<=255,
            # all integers <=256 are exact in bf16), single-term sums
            onehot = (iota == rank.reshape(1, B)).astype(jnp.bfloat16)
            rows = in_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
            out_ref[:] = jnp.dot(
                onehot, rows,
                preferred_element_type=jnp.float32).astype(jnp.int32).astype(jnp.uint8)

    fn = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((total, ROWB), jnp.uint8),
        grid_spec=pl.GridSpec(
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((B, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((B, ROWB), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((B, ROWB), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 128, size=(total, ROWB), dtype=np.uint8))
    ranks = np.stack([rng.permutation(B).astype(np.int32)
                      for _ in range(nblocks)])
    r = jnp.asarray(ranks.reshape(nblocks * B, 1))

    f = jax.jit(lambda rr, v: fn(rr, v))
    y = f(r, x)
    y.block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        y = f(r, x)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    print(f"[onehot-mxu] {nblocks} blocks, {total} rows: {dt*1e3:.1f} ms "
          f"-> {total/dt/1e6:.1f} Mrow/s", flush=True)
    ynp = np.asarray(y)
    xnp = np.asarray(x)
    blk = 2 % nblocks
    out_blk = ynp[blk*B:(blk+1)*B]
    in_blk = xnp[blk*B:(blk+1)*B]
    # out[rank[j]] == in[j]
    rk = ranks[blk]
    assert (out_blk[rk] == in_blk).all(), "onehot permutation mismatch"


if __name__ == "__main__":
    nb = int(os.environ.get("NBLOCKS", "512"))     # 1M rows default
    probe_scatter_dma(nb)
    probe_onehot_mxu(nb)
