"""Pallas pool-backward kernel probe: 3x3/s2/p1 maxpool gradient (NEGATIVE).

A hand-written SelectAndScatter replacement for the stem maxpool's
backward pass. Numerically exact (first-max routing matches torch and
XLA SaS; f32 interpret-mode diff 5e-7, on-chip bf16 diff = accumulation
ulp) and it compiles through Mosaic — but it LOSES in-step on v5e at the
production shape (512^2, batch 32, 64ch): stem segment 26.4 ms vs 12.7
with XLA's SelectAndScatter (pool bwd ~20 ms vs 5.9). The per-window-row
fori_loop (128 sequential iterations x 32 images, each ~50 small VPU ops
on (128,64)/(136,128) tiles + a 2-row flush DMA) is loop-overhead/VPU
bound; SaS's fused scan is already within ~3x of the VPU-work lower
bound (~1.7 ms), leaving too little margin for this structure. An
8-window-vectorized variant was designed (projected ~4 ms) but the
remaining <2 ms win does not justify the complexity. Kept as the
worked example for future Pallas scatter-style kernels, with the Mosaic
pitfalls encountered:

- ANY-space outputs must be whole-array with trivial index_map;
- DMA slice extents must be 8-aligned on the sublane dim (pad pair
  count to a multiple of 8);
- packed-bf16 vector compares (vector<...x2xbf16> cmpf) do not lower —
  cast to f32 in registers first;
- i1 mask relayouts on half-lane (64-wide) shapes can hit "Invalid
  relayout ... replicated in destination" — use float arithmetic
  (eq * (1-claimed)) instead of select chains;
- blocked VMEM inputs are double-buffered across the grid: a 13.5 MB
  working set needs vmem_limit_bytes raised (the 512^2 config runs at
  ~26.9 MB scoped VMEM).

Run: python tools/pool_bwd_pallas_probe.py        (interpret, CPU)
     python tools/pool_bwd_pallas_probe.py tpu    (compiled, real chip)

Layout: rl (b,H,W,C=64) packed lane-dense as (b, H+2, P, 128) where
P = (W+4)/2 rounded up to 8: rows padded 1 top/bottom, cols padded 2
left / rest right with -inf, pairs of input cols share a 128-lane block
(2x64). dy (b,H/2,W/2,64) standard. Output da packed (b, H, P, 128)
(cols sliced in XLA afterwards). Reference semantics:
/root/reference/models/backbones/residuals.py:61 (MaxPool2d 3/2/1).
"""
import functools
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(rlp_ref, dy_ref, out_ref, ring, stage, sem):
    # rlp_ref: (1, H+2, P, 128) VMEM, dy_ref: (1, R, Q, 64) VMEM,
    # out_ref: (1, H, P, 128) ANY/HBM
    # ring: (4, P, 128) f32 scratch; stage: (1, P, 128) bf16; sem: DMA sem
    nrow = dy_ref.shape[1]          # R = H/2 output rows
    npair = rlp_ref.shape[2]        # P packed pairs
    nq = dy_ref.shape[2]            # Q = W/2 output cols

    img = pl.program_id(0)

    def flush(row_old, slot):
        # cast + copy ring slot to out row `row_old`
        stage[0] = ring[slot].astype(out_ref.dtype)
        cp = pltpu.make_async_copy(stage.at[0], out_ref.at[img, row_old], sem)
        cp.start()
        cp.wait()

    def body(r, _):
        rows = rlp_ref[0, pl.ds(2 * r, 3), :, :].astype(jnp.float32)  # (3, P, 128)
        # window-column candidates per output col q in [0, nq):
        #   old col 2q-1 -> padded pair q+0? padded col 2q+1 = pair q hi
        #   old col 2q   -> padded col 2q+2 = pair q+1 lo
        #   old col 2q+1 -> padded col 2q+3 = pair q+1 hi
        cands = []
        for di in range(3):
            v = rows[di]                               # (P, 128)
            cands.append(v[0:nq, 64:128])              # hi of pair q
            cands.append(v[1:nq + 1, 0:64])            # lo of pair q+1
            cands.append(v[1:nq + 1, 64:128])          # hi of pair q+1
        mfin = cands[0]
        for k in range(1, 9):
            mfin = jnp.maximum(mfin, cands[k])
        dyr = dy_ref[0, r, :, :].astype(jnp.float32)   # (Q, 64)
        # float-arithmetic first-max routing (Mosaic dislikes i1/select
        # relayouts on half-lane shapes): claim each window's gradient at
        # the first candidate equal to the window max, in raster order
        claimed = jnp.zeros(mfin.shape, jnp.float32)
        zero64 = jnp.zeros(dyr.shape, jnp.float32)
        for di in range(3):
            slot = (2 * r + di - 1) % 4
            takes = []
            for dj in range(3):
                eq = (cands[3 * di + dj] == mfin).astype(jnp.float32)
                take = eq * (1.0 - claimed)
                claimed = claimed + take
                takes.append(dyr * take)
            c_hiprev, c_lo, c_hi = takes
            # full-lane row contribution: rowc[p, :64] = c_lo[p-1],
            # rowc[p, 64:] = c_hi[p-1] + c_hiprev[p]
            a = jnp.concatenate([c_lo, c_hi], axis=1)        # pairs 1..nq
            bl = jnp.concatenate([zero64, c_hiprev], axis=1)  # pairs 0..nq-1
            rowc = (jnp.pad(a, ((1, npair - nq - 1), (0, 0)))
                    + jnp.pad(bl, ((0, npair - nq), (0, 0))))  # (P, 128)
            ring[slot] += rowc

        # old rows 2r-2 (even, final after iter r-1) and 2r-1 (odd, its
        # last contribution was this iteration) are both final now
        @pl.when(r > 0)
        def _():
            for row_old in (2 * r - 2, 2 * r - 1):
                slot = row_old % 4
                flush(row_old, slot)
                ring[slot] = jnp.zeros_like(ring[slot])

        return 0

    # init ring
    ring[...] = jnp.zeros_like(ring[...])
    jax.lax.fori_loop(0, nrow, body, 0)
    # flush the last two rows (old 2*nrow-2, 2*nrow-1)
    flush(2 * nrow - 2, (2 * nrow - 2) % 4)
    flush(2 * nrow - 1, (2 * nrow - 1) % 4)


def pool_bwd_pallas(rl, dy, interpret=False):
    """d(rl) of y = maxpool3x3/s2/p1(rl) given dy, first-max routing."""
    b, h, w, c = rl.shape
    assert c == 64 and h % 2 == 0 and w % 2 == 0
    r, q = h // 2, w // 2
    neg = jnp.array(-jnp.inf, rl.dtype)
    # pair count padded to a multiple of 8: DMA slices need 8-aligned
    # sublane extents
    p = -(-(w + 4) // 2 // 8) * 8
    rlp = jnp.pad(rl, ((0, 0), (1, 1), (2, 2 * p - w - 2), (0, 0)),
                  constant_values=neg)
    rlp2 = rlp.reshape(b, h + 2, p, 128)
    out = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h + 2, p, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r, q, 64), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((b, h, p, 128), rl.dtype),
        scratch_shapes=[
            pltpu.VMEM((4, p, 128), jnp.float32),
            pltpu.VMEM((1, p, 128), rl.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(rlp2, dy)
    da = out.reshape(b, h, 2 * p, 64)[:, :, 2:w + 2, :]
    return da


if __name__ == "__main__":
    import flax.linen as nn

    interp = True
    try:
        import sys
        interp = sys.argv[1] != "tpu"
    except IndexError:
        pass
    if interp:
        jax.config.update("jax_platforms", "cpu")

    rng = np.random.default_rng(0)
    for shape in ((2, 16, 16, 64), (1, 32, 16, 64)):
        x_np = np.maximum(rng.integers(-2, 3, size=shape), 0).astype(np.float32)
        x = jnp.asarray(x_np, jnp.bfloat16)
        dy_np = rng.normal(size=(shape[0], shape[1]//2, shape[2]//2, 64)).astype(np.float32)
        dy = jnp.asarray(dy_np, jnp.bfloat16)

        def rw(v):
            return nn.max_pool(v, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        g_ref = jax.grad(lambda v: jnp.sum(rw(v).astype(jnp.float32)
                                           * dy.astype(jnp.float32)))(x)
        got = pool_bwd_pallas(x, dy, interpret=interp)
        d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - g_ref.astype(jnp.float32))))
        print(shape, "maxdiff", d, flush=True)
