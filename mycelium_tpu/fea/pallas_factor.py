"""Pallas kernel for one PCR level of the spanning-forest factorization.

The hybrid solve (pallas_tree_big.py) runs the factorization in XLA;
profiling at 309k DOF shows the whale level's PCR coefficient recurrence
plus its 6-column corner solve cost ~12 ms — not arithmetic, but the
~500-op dispatch tail of plane algebra (each op 15-25 us on the
axon-tunneled v5e) and the (S, 6) corner buffers whose 6-wide minor dim
XLA pads to 128 lanes. This kernel fuses BOTH into one launch per level:

- slot planes are packed (rows, 128) f32 (position p = row*128 + lane,
  the pallas_cg packing); shifts by s = 2^k are lane rolls + row rolls
  with a lane-boundary select (generalizing the matvec kernel's
  shift-by-1);
- the PCR data dependence after ``steps`` rounds is bounded by
  sum(2^k) = 2^steps - 1 positions, so the slot axis is processed in
  independent CHUNKS with a 2^steps-position halo: grid over chunks,
  each program DMAs its window from HBM, runs all rounds in VMEM, and
  writes only its central columns. VMEM stays O(window), independent of
  the level size — the whole-solve kernel's spill wall (~350 plane-sized
  SSA values at 309k DOF) never materializes;
- the corner solve rides along: its rhs planes are carried through the
  rounds and updated with the just-computed coefficients (the XLA
  version re-applies them afterwards), so the 6 unit columns cost 18
  extra window planes instead of a second full pass.

Wraparound of in-window rolls is annihilated for the central region by
the halo (outside it, stale values only multiply zero couplings — same
argument the XLA version uses for whole-level rolls at path boundaries).

Numerics are identical to tree_jax._pcr_coeffs + _pcr_apply (elementwise
f32; tested to exact equality on CPU interpret mode).

Reference analogue: the setup half of PETSc's PCSetUp/ICC factorization
(src/fea_petsc.cpp:331-338); this is the TPU-shaped equivalent for the
spanning-forest preconditioner.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 128
CHUNK_ROWS = 128         # central rows per program (CB*128 positions)


def _mm9(a, b):
    """Batched 3x3 block product on (9, wb, 128) plane stacks."""
    return jnp.stack([a[3 * i] * b[k] + a[3 * i + 1] * b[3 + k]
                      + a[3 * i + 2] * b[6 + k]
                      for i in range(3) for k in range(3)])


def _inv9(m):
    a, b, c, d, e, f, g, h, i = (m[k] for k in range(9))
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(det != 0, det, 1.0)
    return jnp.stack(
        (A / det, -(b * i - c * h) / det, (b * f - c * e) / det,
         B / det, (a * i - c * g) / det, -(a * f - c * d) / det,
         C / det, -(a * h - b * g) / det, (a * e - b * d) / det))


def _bsh(x, s):
    """y[.., p] = x[.., p + s] on a (K, rows, 128) packed plane stack
    (position p = row*128 + lane; s may be negative). One batched roll
    instead of K per-plane rolls — roll op count, not roll width, was
    the kernel's cost (measured 9.5 ms -> see PERFORMANCE.md).
    Wraps around the window; callers rely on the halo to keep the
    central region exact."""
    if s == 0:
        return x
    rows = x.shape[1]
    lane = lax.broadcasted_iota(jnp.int32, x.shape, 2)
    if s > 0:
        q, r = divmod(s, BLOCK)
        if r == 0:
            return pltpu.roll(x, (-q) % rows, 1)
        t = pltpu.roll(x, BLOCK - r, 2)          # t[.., l] = x[.., l+r]
        a = pltpu.roll(t, (-q) % rows, 1)
        b = pltpu.roll(t, (-(q + 1)) % rows, 1)
        return jnp.where(lane < BLOCK - r, a, b)
    s = -s
    q, r = divmod(s, BLOCK)
    if r == 0:
        return pltpu.roll(x, q % rows, 1)
    t = pltpu.roll(x, r, 2)                      # t[.., l] = x[.., l-r]
    a = pltpu.roll(t, q % rows, 1)
    b = pltpu.roll(t, (q + 1) % rows, 1)
    return jnp.where(lane >= r, a, b)


def _factor_kernel(steps, cb, wb, halo,
                   d_hbm, b_hbm, r_hbm,
                   al_ref, be_ref, dinv_ref, x_ref,
                   dscr, bscr, rscr, sems):
    ci = pl.program_id(0)
    row0 = ci * cb
    cps = [pltpu.make_async_copy(
               d_hbm.at[:, pl.ds(row0, wb), :], dscr, sems.at[0]),
           pltpu.make_async_copy(
               b_hbm.at[:, pl.ds(row0, wb), :], bscr, sems.at[1]),
           pltpu.make_async_copy(
               r_hbm.at[:, pl.ds(row0, wb), :], rscr, sems.at[2])]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    D = dscr[:]                                  # (9, wb, 128)
    B = bscr[:]
    r = rscr[:]                                  # (18, wb, 128)
    L = jnp.stack([B[c] for c in (0, 3, 6, 1, 4, 7, 2, 5, 8)])
    R = _bsh(B, 1)

    ctr = slice(halo, halo + cb)
    s = 1
    for k in range(steps):
        dinv = _inv9(D)
        a = _mm9(L, _bsh(dinv, -s))
        b = _mm9(R, _bsh(dinv, s))
        # same fp association as tree_jax._pcr_coeffs: D - (aR + bL)
        D = D - (_mm9(a, _bsh(R, -s)) + _mm9(b, _bsh(L, s)))
        L = -_mm9(a, _bsh(L, -s))
        R = -_mm9(b, _bsh(R, s))
        # corner columns ride along: r -= (a·r[i-s] + b·r[i+s])
        # (r plane 6*i + j = component i of unit column j)
        rm = _bsh(r, -s)
        rp = _bsh(r, s)
        r = r - jnp.stack(
            [(a[3 * i] * rm[j] + a[3 * i + 1] * rm[6 + j]
              + a[3 * i + 2] * rm[12 + j])
             + (b[3 * i] * rp[j] + b[3 * i + 1] * rp[6 + j]
                + b[3 * i + 2] * rp[12 + j])
             for i in range(3) for j in range(6)])
        al_ref[k] = a[:, ctr]
        be_ref[k] = b[:, ctr]
        s *= 2
    dinv = _inv9(D)
    dinv_ref[:] = dinv[:, ctr]
    x_ref[:] = jnp.stack(
        [dinv[3 * i] * r[j] + dinv[3 * i + 1] * r[6 + j]
         + dinv[3 * i + 2] * r[12 + j]
         for i in range(3) for j in range(6)])[:, ctr]


def halo_rows(steps: int) -> int:
    """Halo row count covering the PCR dependence distance 2^steps - 1,
    rounded up to a multiple of 8 so the rolled window axis
    wb = chunk_rows + 2*halo stays sublane-aligned whenever chunk_rows
    itself is a multiple of 8 (the default CHUNK_ROWS=128 is)."""
    halo_pos = max((1 << steps) - 1, 1)
    return -(-(-(-halo_pos // BLOCK)) // 8) * 8


def _pack_padded(planes, nb_pad, halo, S):
    """tuple of (S,) planes -> (len, halo + nb_pad + halo, 128) array."""
    x = jnp.stack([jnp.pad(p, (0, nb_pad * BLOCK - S)) for p in planes])
    x = x.reshape(len(planes), nb_pad, BLOCK)
    return jnp.pad(x, ((0, 0), (halo, halo), (0, 0)))


def pcr_level_kernel(D, B, fg, lg, steps: int, interpret: bool = False,
                     chunk_rows: int | None = None):
    """One PCR level, fused: coefficients + final block inverses + the
    6-column corner solve. D, B: tuple9 of (S,) planes. fg/lg: (P,) int32
    first/last slot of each path (level-local). Returns
    (dinv tuple9 of (S,),
    xcols tuple18 of (S,) — plane 6*i+j is component i of corner column j,
    ordered [first x/y/z, last x/y/z],
    packed — (al, be, dinv) in the packed (steps, 9, rows, 128) layout the
    apply kernel streams per round, kept on the TreeFactor so per-iteration
    applies skip the repack; the unpacked (steps, 9, S) coefficient views
    are derived on demand via unpack_coeffs — storing both roughly doubled
    the factor's coefficient HBM footprint at 309k DOF. The stored slabs
    carry ``halo_rows(steps)`` zero rows on BOTH row ends so the chunked
    apply kernel's windows start at static offsets — Mosaic cannot lower a
    dynamic_slice of a value, so the clamped-window variant that computed
    its output offset at runtime failed to compile on real TPU).

    ``chunk_rows`` overrides the central-rows-per-program window (module
    default CHUNK_ROWS); tests force small windows so the multi-chunk
    halo/DMA path runs on small meshes."""
    S = D[0].shape[0]
    dtype = D[0].dtype
    halo = halo_rows(steps)
    cb = CHUNK_ROWS if chunk_rows is None else chunk_rows
    nb = -(-S // BLOCK)
    nb_pad = -(-nb // cb) * cb
    wb = cb + 2 * halo
    n_chunks = nb_pad // cb

    d_in = _pack_padded(D, nb_pad, halo, S)
    b_in = _pack_padded(B, nb_pad, halo, S)
    # corner rhs: unit blocks at path-first (cols 0:3) / path-last (3:6)
    rhs = []
    for i in range(3):
        for j in range(6):
            p = jnp.zeros((S,), dtype)
            if j == i:
                p = p.at[fg].add(1.0)
            elif j == 3 + i:
                p = p.at[lg].add(1.0)
            rhs.append(p)
    r_in = _pack_padded(tuple(rhs), nb_pad, halo, S)

    kernel = functools.partial(_factor_kernel, steps, cb, wb, halo)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    out_shapes = (
        jax.ShapeDtypeStruct((steps, 9, nb_pad, BLOCK), dtype),
        jax.ShapeDtypeStruct((steps, 9, nb_pad, BLOCK), dtype),
        jax.ShapeDtypeStruct((9, nb_pad, BLOCK), dtype),
        jax.ShapeDtypeStruct((18, nb_pad, BLOCK), dtype),
    )
    out_specs = (
        pl.BlockSpec((steps, 9, cb, BLOCK), lambda i: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((steps, 9, cb, BLOCK), lambda i: (0, 0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, cb, BLOCK), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((18, cb, BLOCK), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    )
    al, be, dinv, x = pl.pallas_call(
        kernel,
        grid=(n_chunks,),
        out_shape=out_shapes,
        in_specs=[anyspec, anyspec, anyspec],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((9, wb, BLOCK), dtype),
            pltpu.VMEM((9, wb, BLOCK), dtype),
            pltpu.VMEM((18, wb, BLOCK), dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(d_in, b_in, r_in)

    # store the slabs halo-padded (zero rows both ends): the chunked apply
    # kernel's DMA windows then start at the STATIC offset ci*cb and its
    # output slice at the static offset halo (dynamic_slice of a value has
    # no Mosaic lowering — measured compile failure at the 860k-slot level)
    pad3 = ((0, 0), (0, 0), (halo, halo), (0, 0))
    pad2 = ((0, 0), (halo, halo), (0, 0))
    packed = (jnp.pad(al, pad3), jnp.pad(be, pad3), jnp.pad(dinv, pad2))
    dinv = tuple(dinv[c].reshape(-1)[:S] for c in range(9))
    x = tuple(x[c].reshape(-1)[:S] for c in range(18))
    return dinv, x, packed


def unpack_coeffs(packed, steps: int, S: int):
    """Derive the unpacked (steps, 9, S) alpha/beta views from a kernel
    level's packed layout (reshape + slice — no extra HBM copy unless the
    caller materializes them)."""
    al_p, be_p, _ = packed
    halo = halo_rows(steps)
    al = al_p[:, :, halo:-halo].reshape(steps, 9, -1)[:, :, :S]
    be = be_p[:, :, halo:-halo].reshape(steps, 9, -1)[:, :, :S]
    return al, be


def apply_kernel_vmem_bytes(S: int, itemsize: int = 4,
                            chunk_rows: int | None = None,
                            steps: int = 0) -> int:
    """VMEM footprint of the WHOLE-LEVEL pcr_apply_planes_kernel at level
    size S. Counts 36 plane-sized slabs: two (9, rows, 128) coefficient
    scratches + residual/shift/update/solution temporaries and Mosaic
    stack slack — calibrated against a measured compile failure at
    860k slots (122.4 MB scoped = ~35.2 planes; the old 24-plane estimate
    passed the gate and hit the cliff). Levels past APPLY_WHOLE_LIMIT
    dispatch to the chunked-window apply kernel instead (VMEM O(window),
    any level size)."""
    cb = CHUNK_ROWS if chunk_rows is None else chunk_rows
    nb = -(-S // BLOCK)
    nb_pad = -(-nb // cb) * cb
    rows = nb_pad + 2 * halo_rows(steps)
    return 36 * rows * BLOCK * itemsize


# whole-level apply past this footprint switches to the chunked kernel
# (kept under the 112 MB Mosaic scoped-vmem ceiling with headroom)
APPLY_WHOLE_LIMIT = 100 * 2 ** 20


def _apply_kernel(steps, halo, nb_pad,
                  al_hbm, be_hbm, dv_hbm, r_ref,
                  u_ref, ascr, bscr, sems):
    """One PCR down-sweep application: r_k+1 = r_k - (a_k r[.-s] +
    b_k r[.+s]), u = dinv·r. The residual planes live whole in VMEM
    (tiny — (3, rows, 128)); only the per-round coefficient slabs
    stream from HBM, one contiguous DMA each. Operands carry the
    factor's halo padding (zero rows both ends); the output drops it
    with a static slice. Roll wraparound over the packed array is
    annihilated by zero coefficients at path bounds — the same argument
    the XLA plane apply relies on."""
    r = r_ref[:]                                 # (3, rows, 128)
    s = 1
    for k in range(steps):
        cp_a = pltpu.make_async_copy(al_hbm.at[k], ascr, sems.at[0])
        cp_b = pltpu.make_async_copy(be_hbm.at[k], bscr, sems.at[1])
        cp_a.start()
        cp_b.start()
        # the shifts don't need the coefficients — overlap them with
        # the in-flight DMAs, then wait before the update
        rm = _bsh(r, -s)
        rp = _bsh(r, s)
        cp_a.wait()
        cp_b.wait()
        a = ascr[:]
        b = bscr[:]
        r = r - jnp.stack(
            [(a[3 * i] * rm[0] + a[3 * i + 1] * rm[1]
              + a[3 * i + 2] * rm[2])
             + (b[3 * i] * rp[0] + b[3 * i + 1] * rp[1]
                + b[3 * i + 2] * rp[2])
             for i in range(3)])
        s *= 2
    cp_d = pltpu.make_async_copy(dv_hbm, ascr, sems.at[0])
    cp_d.start()
    cp_d.wait()
    d = ascr[:]
    u = jnp.stack(
        [d[3 * i] * r[0] + d[3 * i + 1] * r[1] + d[3 * i + 2] * r[2]
         for i in range(3)])
    u_ref[:] = u[:, halo:halo + nb_pad]


def _apply_kernel_chunked(steps, cb, wb, halo,
                          al_hbm, be_hbm, dv_hbm, r_hbm,
                          u_ref, ascr, bscr, rscr, sems):
    """Chunked-window PCR apply: each program owns cb central rows, DMAs
    a (wb = cb + 2*halo)-row window of the residual once and of the
    coefficient slabs per round — VMEM stays O(window) at any level size
    (the whole-level variant's two full coefficient slabs bust the 112 MB
    Mosaic ceiling past ~700k slots; measured at 860k). All HBM operands
    are halo-padded with zero rows on both ends (the factor stores the
    slabs that way), so every window start is the STATIC offset ci*cb and
    the output slice the static offset halo — Mosaic has no lowering for
    a dynamic_slice of a value, so the clamped-window variant failed to
    compile on hardware. Roll wraparound across the window is annihilated
    by the zero coefficients at path boundaries (the factor kernel's
    invariant); the zero halo rows only strengthen it."""
    ci = pl.program_id(0)
    row0 = ci * cb                           # padded-row window start
    cp_r = pltpu.make_async_copy(
        r_hbm.at[:, pl.ds(row0, wb), :], rscr, sems.at[2])
    cp_r.start()
    cp_r.wait()
    r = rscr[:]                              # (3, wb, 128)
    s = 1
    for k in range(steps):
        cp_a = pltpu.make_async_copy(
            al_hbm.at[k, :, pl.ds(row0, wb), :], ascr, sems.at[0])
        cp_b = pltpu.make_async_copy(
            be_hbm.at[k, :, pl.ds(row0, wb), :], bscr, sems.at[1])
        cp_a.start()
        cp_b.start()
        rm = _bsh(r, -s)                     # overlaps the DMAs
        rp_ = _bsh(r, s)
        cp_a.wait()
        cp_b.wait()
        a = ascr[:]
        b = bscr[:]
        r = r - jnp.stack(
            [(a[3 * i] * rm[0] + a[3 * i + 1] * rm[1]
              + a[3 * i + 2] * rm[2])
             + (b[3 * i] * rp_[0] + b[3 * i + 1] * rp_[1]
                + b[3 * i + 2] * rp_[2])
             for i in range(3)])
        s *= 2
    cp_d = pltpu.make_async_copy(
        dv_hbm.at[:, pl.ds(row0, wb), :], ascr, sems.at[0])
    cp_d.start()
    cp_d.wait()
    d = ascr[:]
    u = jnp.stack(
        [d[3 * i] * r[0] + d[3 * i + 1] * r[1] + d[3 * i + 2] * r[2]
         for i in range(3)])
    u_ref[:] = u[:, halo:halo + cb]


def pcr_apply_planes_kernel(packed, rp, steps: int, S: int,
                            interpret: bool = False):
    """x = T^{-1} r on one PCR level, one kernel launch.

    ``packed`` is the (al, be, dinv) triple pcr_level_kernel returned,
    halo-padded along rows (al/be (steps, 9, rows, 128); dinv
    (9, rows, 128) with rows = nb_pad + 2*halo_rows(steps)). rp: tuple3
    of (S,) planes. Replaces the XLA _pcr_apply whose ~25 plane ops x
    steps rounds cost ~2.3 ms per CG iteration at 309k DOF. Levels whose
    whole-level VMEM footprint exceeds APPLY_WHOLE_LIMIT run the
    chunked-window variant instead (grid over row chunks, coefficient
    windows streamed per round — any level size)."""
    al_p, be_p, dv_p = packed
    dtype = rp[0].dtype
    halo = halo_rows(steps)
    rows = dv_p.shape[1]
    nb_pad = rows - 2 * halo
    r_in = _pack_padded(rp, nb_pad, halo, S)

    cb = CHUNK_ROWS
    wb = cb + 2 * halo
    if apply_kernel_vmem_bytes(S, jnp.dtype(dtype).itemsize, steps=steps) \
            > APPLY_WHOLE_LIMIT and nb_pad >= cb:
        n_chunks = nb_pad // cb
        kernel = functools.partial(_apply_kernel_chunked, steps, cb, wb,
                                   halo)
        anyspec = pl.BlockSpec(memory_space=pl.ANY)
        u = pl.pallas_call(
            kernel,
            grid=(n_chunks,),
            out_shape=jax.ShapeDtypeStruct((3, nb_pad, BLOCK), dtype),
            in_specs=[anyspec, anyspec, anyspec, anyspec],
            out_specs=pl.BlockSpec((3, cb, BLOCK), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((9, wb, BLOCK), dtype),
                pltpu.VMEM((9, wb, BLOCK), dtype),
                pltpu.VMEM((3, wb, BLOCK), dtype),
                pltpu.SemaphoreType.DMA((3,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(al_p, be_p, dv_p, r_in)
        return tuple(u[i].reshape(-1)[:S] for i in range(3))

    kernel = functools.partial(_apply_kernel, steps, halo, nb_pad)
    anyspec = pl.BlockSpec(memory_space=pl.ANY)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    u = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, nb_pad, BLOCK), dtype),
        in_specs=[anyspec, anyspec, anyspec, vmem],
        out_specs=vmem,
        scratch_shapes=[
            pltpu.VMEM((9, rows, BLOCK), dtype),
            pltpu.VMEM((9, rows, BLOCK), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(al_p, be_p, dv_p, r_in)
    return tuple(u[i].reshape(-1)[:S] for i in range(3))
