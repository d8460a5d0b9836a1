"""Whole-solve Pallas kernel with the spanning-forest preconditioner.

One Mosaic program runs the ENTIRE preconditioned CG solve: the tree
factorization (parallel cyclic reduction coefficients per level + per-path
Schur corrections), the CG loop, and the preconditioner applications, all
VMEM-resident. The XLA-level implementation (tree_jax.py) pays ~15-25 us
of dispatch per op across the ~500-op factorization (8 ms/solve on the
axon-tunneled v5e); in-kernel the same arithmetic is microseconds.

Layouts (see pallas_cg.py for the chain-space conventions):

- chain space: the matvec's (3*NBc, 128) stacked component planes
  (chain-permuted nodes) — unchanged from pallas_cg.
- slot space: tree-schedule slots (all levels concatenated, path-ordered)
  packed the same way into (3*NBt, 128) vectors and (9*NBt, 128) 3x3
  fields (plane ij at rows [(3i+j)*NBt, ...)). Levels occupy slot RANGES;
  static {0,1} level masks gate every PCR update, so one global buffer
  holds all levels' PCR coefficients (their rows are disjoint).
- path space: per-path quantities packed into (NPb, 128) planes; the two
  attachment sides are stacked [side0; side1] to share one-hot tables.

All index plumbing is static (host-built one-hot tables driving exact MXU
matmuls, Precision.HIGHEST); per-solve numerics (active mask, anchoring,
diagonal) arrive as small XLA-prepared planes. Shift reads that cross
path/level/plane boundaries are always annihilated by zero couplings, so
no padding tricks are needed beyond >=1 pad slot.

Reference analogue: PETSc KSPSolve with ICC (src/fea_petsc.cpp:323-341);
this kernel replaces both the Krylov loop and the preconditioner setup.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FeaConfig
from .chain import BLOCK
from .solve import SolveResult
from .tree import KIND_ELEM, KIND_FILL, KIND_NONE

HI = lax.Precision.HIGHEST


class PackedTreeData(NamedTuple):
    """Static tables for the in-kernel tree preconditioner."""
    # ----- slot-space -----
    k3l: jnp.ndarray         # (9*NBt, 128) -k3 of element left edges
    lvm: jnp.ndarray         # (L*NBt, 128) level masks over slots
    fm: jnp.ndarray          # (NBt, 128) 1.0 at path-first slots
    lm: jnp.ndarray          # (NBt, 128) 1.0 at path-last slots
    # ----- path-space -----
    k3a0: jnp.ndarray        # (9*NPb, 128) -k3 of element attachment
    k3a1: jnp.ndarray        # edges, one array per side
    pvm: jnp.ndarray         # (L*NPb, 128) level masks over paths
    hf: jnp.ndarray          # (NPb, 128) has_fill mask
    # ----- one-hot tables -----
    fl_blk: jnp.ndarray      # (2*Pp, NBt)  gather at [first; last] slots
    fl_lane: jnp.ndarray     # (2*Pp, 128)
    at_blk: jnp.ndarray      # (2*Pp, NBt)  scatter to attachment targets
    at_lane: jnp.ndarray     # (2*Pp, 128)
    fs_blk_n: jnp.ndarray    # (Pp, NBt)    fill -> left-edge slot (no flip)
    fs_lane_n: jnp.ndarray   # (Pp, 128)
    fs_blk_f: jnp.ndarray    # (Pp, NBt)    fill -> left-edge slot (flip)
    fs_lane_f: jnp.ndarray   # (Pp, 128)
    # fill -> attachment-value gathers, per side x flip (transposed use)
    af_blk_n0: jnp.ndarray   # (Pp, NPb)
    af_lane_n0: jnp.ndarray  # (Pp, 128)
    af_blk_f0: jnp.ndarray
    af_lane_f0: jnp.ndarray
    af_blk_n1: jnp.ndarray
    af_lane_n1: jnp.ndarray
    af_blk_f1: jnp.ndarray
    af_lane_f1: jnp.ndarray
    # UNIFIED LAYOUT: chain position s == slot s (model._unified_order), so
    # the old (NBt*128, NBc) slot<->chain one-hot tables — the quadratic
    # VMEM ceiling of round 1 — are gone: slot space is a row-slice of each
    # chain component plane.
    # identity row<->plane conversion tables for PATH space (Mosaic cannot
    # reshape between (rows,1) and (nb,128); these make it a one-hot matmul)
    idp_blk: jnp.ndarray     # (Pp, NPb)
    idp_lane: jnp.ndarray    # (Pp, 128)
    id2p_blk: jnp.ndarray    # (2*Pp, 2*NPb)
    id2p_lane: jnp.ndarray   # (2*Pp, 128)
    slotcov: jnp.ndarray     # (3*NBc, 128) 1.0 at chain positions < S_tot
                             # (slots; complement passes r through)
    # index arrays for the per-solve XLA prep (not kernel inputs)
    left_elem: jnp.ndarray   # (NBt*128,) int32 (E sentinel)
    att_elem: jnp.ndarray    # (2*Pp,) int32 (E sentinel)
    slot_node: jnp.ndarray   # (NBt*128,) int32 node id (N sentinel)

    @property
    def nbt(self) -> int:
        return self.fm.shape[0]

    @property
    def npb(self) -> int:
        return self.hf.shape[0]

    @property
    def n_levels(self) -> int:
        return self.lvm.shape[0] // self.fm.shape[0]


def tree_slot_blocks(schedule) -> int:
    """Slot-plane block count NBt (8-row aligned, >=1 pad slot). The
    unified chain layout must be at least this tall (model.py nb_eff)."""
    S_tot = sum(len(lv.slots) for lv in schedule.levels)
    return ((S_tot // BLOCK + 1 + 7) // 8) * 8


def tree_kernel_vmem_bytes(schedule, n_nodes: int) -> int:
    """Byte count of the PackedTreeData tables plus kernel scratch.

    With the unified chain==slot ordering the round-1 quadratic
    slot<->chain one-hots are gone; the dominant terms are now the PCR
    coefficient scratch (2 * r_star * 9 planes over slots — linear in mesh
    size) and the path->slot one-hot tables (paths x slot-blocks, small
    because P << S). ~95 MB at 103k nodes / 309k DOF with reference-like
    grips, so the whole-solve kernel now covers that scale in VMEM; the
    XLA fallback only engages beyond cfg.pallas_vmem_limit_mb.
    """
    from .pallas_cg import plan_nb
    levels = schedule.levels
    L = len(levels)
    P_tot = sum(len(lv.first_pos) for lv in levels)
    NBt = tree_slot_blocks(schedule)
    NPb = ((max(P_tot // BLOCK + 1, 1) + 7) // 8) * 8
    Sp, Pp = NBt * BLOCK, NPb * BLOCK
    nbc = max(plan_nb(n_nodes), NBt)
    r_star = 0
    for lv in levels:
        lens = lv.last_pos - lv.first_pos + 1
        maxlen = int(lens.max()) if len(lens) else 1
        r_star = max(r_star, int(np.ceil(np.log2(max(maxlen, 1)))))
    f32s = (
        9 * Sp                      # k3l
        + L * Sp + 2 * Sp           # lvm, fm, lm
        + 2 * 9 * Pp + L * Pp + Pp  # k3a0/1, pvm, hf
        + 3 * nbc * BLOCK           # slotcov
        # scratch: ascr + bscr + dinv + ab0 + ab1
        + 2 * max(r_star, 1) * 9 * Sp + 9 * Sp + 2 * 9 * Pp
        # scratch: chain coeffs, Dc/Lw/Rw, B9/dacc9, fill9, CG x/r/p
        + 9 * nbc * BLOCK + 27 * Sp + 18 * Sp + 9 * Pp + 9 * nbc * BLOCK
        # register-spill allowance: Mosaic assigns every spilled
        # plane-sized value in the factorization's 3x3-field expression
        # chains its own VMEM slot — measured ~83 MB at NBt=432, i.e.
        # ~390 slot-plane equivalents, scaling with the plane height.
        # This is what actually bounds the single-kernel mode (~45k nodes);
        # beyond it build_model picks the hybrid path (pallas_tree_big)
        + 420 * Sp
        # transient per-chunk f32 upcasts of the bf16 tables
        + 4 * 1024 * (NBt + BLOCK)
    )
    bf16s = (                          # one-hot tables (2 bytes each)
        2 * 2 * Pp * (NBt + BLOCK)     # fl_*, at_*
        + 2 * Pp * (NBt + BLOCK)       # fs_* (n/f)
        + 4 * Pp * (NPb + BLOCK)       # af_* (4 side x flip combos)
        + Pp * (NPb + BLOCK)           # idp_*
        + 2 * Pp * (2 * NPb + BLOCK)   # id2p_*
    )
    return 4 * f32s + 2 * bf16s


def _pad_to(x, n, fill=0):
    pad = n - x.shape[0]
    return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1),
                  constant_values=fill)


def _plane(v, nb):
    """(n,) -> (nb, 128)."""
    return _pad_to(np.asarray(v, np.float32), nb * BLOCK).reshape(nb, BLOCK)


def _onehot(idx, rows, nblk):
    """Two-stage one-hot for positions idx (negative = no-op row).

    Stored as bfloat16: 0.0/1.0 are exact in bf16, and the kernel upcasts
    per chunk before the `Precision.HIGHEST` matmuls, so selection stays
    f32-exact while the VMEM table cost halves."""
    blk = np.zeros((rows, nblk), np.float32)
    lane = np.zeros((rows, BLOCK), np.float32)
    m = np.asarray(idx) >= 0
    r = np.arange(len(idx))[m]
    v = np.asarray(idx)[m]
    blk[r, v // BLOCK] = 1.0
    lane[r, v % BLOCK] = 1.0
    import ml_dtypes
    return blk.astype(ml_dtypes.bfloat16), lane.astype(ml_dtypes.bfloat16)


def pack_tree_plan(schedule, chain_plan, n_nodes: int,
                   k3: np.ndarray,
                   host: dict | None = None) -> PackedTreeData:
    """Build the static kernel tables from the host schedule.

    k3: (E,3,3) host element couplings (f64). ``host`` is
    build_chain_plan's host_out dict — with it, nothing is fetched back
    from the device (see pack_plan)."""
    levels = schedule.levels
    conn = np.asarray(schedule.conn)
    E = len(conn)
    L = len(levels)
    k3 = np.asarray(k3, np.float64)

    slots = (np.concatenate([lv.slots for lv in levels]) if L
             else np.zeros((0,), np.int32))
    S_tot = len(slots)
    left_kind = (np.concatenate([lv.left_kind for lv in levels]) if L
                 else np.zeros((0,), np.int8))
    left_id = (np.concatenate([lv.left_id for lv in levels]) if L
               else np.zeros((0,), np.int32))
    left_flip = (np.concatenate([lv.left_flip for lv in levels]) if L
                 else np.zeros((0,), bool))
    lvl_of_slot = (np.concatenate(
        [np.full(len(lv.slots), li) for li, lv in enumerate(levels)])
        if L else np.zeros((0,), np.int32))

    s_off = np.cumsum([0] + [len(lv.slots) for lv in levels])
    first = (np.concatenate([lv.first_pos + s_off[i]
                             for i, lv in enumerate(levels)]).astype(np.int64)
             if L else np.zeros((0,), np.int64))
    last = (np.concatenate([lv.last_pos + s_off[i]
                            for i, lv in enumerate(levels)]).astype(np.int64)
            if L else np.zeros((0,), np.int64))
    P_tot = len(first)
    lvl_of_path = (np.concatenate(
        [np.full(len(lv.first_pos), li) for li, lv in enumerate(levels)])
        if L else np.zeros((0,), np.int32))
    att_kind = (np.concatenate([lv.att_kind for lv in levels]) if L
                else np.zeros((0, 2), np.int8))
    att_id = (np.concatenate([lv.att_id for lv in levels]) if L
              else np.zeros((0, 2), np.int32))
    att_flip = (np.concatenate([lv.att_flip for lv in levels]) if L
                else np.zeros((0, 2), bool))
    att_tgt = (np.concatenate([s_off[lv.att_level] + lv.att_pos
                               for lv in levels]).astype(np.int64)
               if L else np.zeros((0, 2), np.int64))
    att_none = att_kind == KIND_NONE

    fill_to_path = {}
    p_base = 0
    for lv in levels:
        for p, f in enumerate(lv.fill_out):
            if f >= 0:
                fill_to_path[int(f)] = p_base + p
        p_base += len(lv.first_pos)
    has_fill = (np.concatenate([lv.fill_out >= 0 for lv in levels]) if L
                else np.zeros((0,), bool))

    # rounded to multiples of 8 rows: the kernel's fori_loops slice VMEM
    # at dynamic offsets k*9*NBt etc., which must stay sublane-aligned
    NBt = ((S_tot // BLOCK + 1 + 7) // 8) * 8
    NPb = ((max(P_tot // BLOCK + 1, 1) + 7) // 8) * 8
    Pp = NPb * BLOCK
    Sp = NBt * BLOCK

    # ---- slot-space static element couplings (left edges) ----
    is_le = left_kind == KIND_ELEM
    k3l = np.zeros((Sp, 3, 3), np.float64)
    k3l[:S_tot][is_le] = -k3[left_id[is_le]]
    left_elem = np.full(Sp, E, np.int32)
    left_elem[:S_tot][is_le] = left_id[is_le]

    # left fill sources: scatter tables fill-path -> slot, split by flip
    is_lf = left_kind == KIND_FILL
    lf_slot = np.nonzero(is_lf)[0]
    lf_path = np.array([fill_to_path[int(f)] for f in left_id[lf_slot]],
                       np.int64) if len(lf_slot) else np.zeros(0, np.int64)
    lf_flip = left_flip[lf_slot]
    # tables are indexed by PATH row, pointing at the SLOT position
    def fill_scatter(sel):
        tgt = np.full(Pp, -1, np.int64)
        if len(lf_slot):
            tgt[lf_path[sel]] = lf_slot[sel]
        return _onehot(tgt, Pp, NBt)

    fs_blk_n, fs_lane_n = fill_scatter(~lf_flip)
    fs_blk_f, fs_lane_f = fill_scatter(lf_flip)

    # ---- attachment tables (sides stacked [side0; side1]) ----
    fl_idx = np.full(2 * Pp, -1, np.int64)
    fl_idx[:P_tot] = first
    fl_idx[Pp:Pp + P_tot] = last
    fl_blk, fl_lane = _onehot(fl_idx, 2 * Pp, NBt)

    at_idx = np.full(2 * Pp, -1, np.int64)
    at_idx[:P_tot] = np.where(att_none[:, 0], -1, att_tgt[:, 0])
    at_idx[Pp:Pp + P_tot] = np.where(att_none[:, 1], -1, att_tgt[:, 1])
    at_blk, at_lane = _onehot(at_idx, 2 * Pp, NBt)

    # attachment element values B[j,s] (element k is symmetric, flip moot)
    k3a = np.zeros((2, Pp, 3, 3), np.float64)
    att_elem = np.full(2 * Pp, E, np.int32)
    for side in range(2):
        is_ae = att_kind[:, side] == KIND_ELEM
        rows = np.nonzero(is_ae)[0]
        k3a[side, rows] = -k3[att_id[rows, side]]
        att_elem[side * Pp + rows] = att_id[rows, side]

    # attachment fill values: gather from fill path-planes, per side and
    # flip (att_flip=True consumes the transpose of the stored fill value)
    def att_fill_tables(side, want_flip):
        src = np.full(Pp, -1, np.int64)
        is_af = (att_kind[:, side] == KIND_FILL) \
            & (att_flip[:, side] == want_flip)
        rows = np.nonzero(is_af)[0]
        src[rows] = [fill_to_path[int(f)] for f in att_id[rows, side]]
        return _onehot(src, Pp, NPb)

    af_blk_n0, af_lane_n0 = att_fill_tables(0, False)
    af_blk_f0, af_lane_f0 = att_fill_tables(0, True)
    af_blk_n1, af_lane_n1 = att_fill_tables(1, False)
    af_blk_f1, af_lane_f1 = att_fill_tables(1, True)

    # ---- masks ----
    lvm = np.zeros((L, NBt, BLOCK), np.float32)
    for li in range(L):
        m = _plane((lvl_of_slot == li).astype(np.float32), NBt)
        lvm[li] = m
    pvm = np.zeros((L, NPb, BLOCK), np.float32)
    for li in range(L):
        v = np.zeros(Pp, np.float32)
        v[:P_tot] = (lvl_of_path == li)
        pvm[li] = v.reshape(NPb, BLOCK)
    fmv = np.zeros(Sp, np.float32)
    fmv[first] = 1.0
    lmv = np.zeros(Sp, np.float32)
    lmv[last] = 1.0
    hfv = np.zeros(Pp, np.float32)
    hfv[:P_tot] = has_fill

    # ---- unified layout: chain position s == slot s ----
    inv_perm = (host["inv_perm"] if host is not None
                else np.asarray(chain_plan.inv_perm))  # node -> chain pos
    if not np.array_equal(inv_perm[slots], np.arange(S_tot)):
        raise ValueError(
            "pack_tree_plan requires the unified ordering (chain position "
            "== tree slot); build the model through build_model so "
            "_unified_order drives the chain permutation")
    from .pallas_cg import plan_nb
    nbc = max(plan_nb(n_nodes), NBt)   # chain planes at least slot-tall
    slot_node = np.full(Sp, n_nodes, np.int32)
    slot_node[:S_tot] = slots
    idp_blk, idp_lane = _onehot(np.arange(Pp), Pp, NPb)
    id2p_blk, id2p_lane = _onehot(np.arange(2 * Pp), 2 * Pp, 2 * NPb)
    slotcov = np.zeros(nbc * BLOCK, np.float32)
    slotcov[:S_tot] = 1.0
    slotcov3 = np.concatenate([slotcov.reshape(nbc, BLOCK)] * 3, axis=0)

    def m9(m33):
        """(R,3,3) -> (9*NB, 128) planes, row-major ij."""
        nb = m33.shape[0] // BLOCK
        return np.concatenate(
            [m33[:, i, j].reshape(nb, BLOCK) for i in range(3)
             for j in range(3)], axis=0).astype(np.float32)

    f32 = jnp.float32
    return PackedTreeData(
        k3l=jnp.asarray(m9(k3l)),
        lvm=jnp.asarray(lvm.reshape(L * NBt, BLOCK)),
        fm=jnp.asarray(fmv.reshape(NBt, BLOCK)),
        lm=jnp.asarray(lmv.reshape(NBt, BLOCK)),
        k3a0=jnp.asarray(m9(k3a[0])),
        k3a1=jnp.asarray(m9(k3a[1])),
        pvm=jnp.asarray(pvm.reshape(L * NPb, BLOCK)),
        hf=jnp.asarray(hfv.reshape(NPb, BLOCK)),
        fl_blk=jnp.asarray(fl_blk), fl_lane=jnp.asarray(fl_lane),
        at_blk=jnp.asarray(at_blk), at_lane=jnp.asarray(at_lane),
        fs_blk_n=jnp.asarray(fs_blk_n), fs_lane_n=jnp.asarray(fs_lane_n),
        fs_blk_f=jnp.asarray(fs_blk_f), fs_lane_f=jnp.asarray(fs_lane_f),
        af_blk_n0=jnp.asarray(af_blk_n0), af_lane_n0=jnp.asarray(af_lane_n0),
        af_blk_f0=jnp.asarray(af_blk_f0), af_lane_f0=jnp.asarray(af_lane_f0),
        af_blk_n1=jnp.asarray(af_blk_n1), af_lane_n1=jnp.asarray(af_lane_n1),
        af_blk_f1=jnp.asarray(af_blk_f1), af_lane_f1=jnp.asarray(af_lane_f1),
        idp_blk=jnp.asarray(idp_blk), idp_lane=jnp.asarray(idp_lane),
        id2p_blk=jnp.asarray(id2p_blk), id2p_lane=jnp.asarray(id2p_lane),
        slotcov=jnp.asarray(slotcov3),
        left_elem=jnp.asarray(left_elem),
        att_elem=jnp.asarray(att_elem),
        slot_node=jnp.asarray(slot_node),
    )


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _tree_cg_kernel(nbc, nbt, npb, n_levels, r_star, jp, max_iter, rtol,
                    reg,
                    uk_ref, x0_ref, freem_ref, cact_ref, jact_ref,
                    cn_ref, ckax_ref, ckbd_ref,
                    ab_blk_ref, ab_lane_ref, jscal_ref,
                    d9_ref, ml_ref, ma_ref,
                    k3l_ref, lvm_ref, fm_ref, lm_ref,
                    k3a0_ref, k3a1_ref, pvm_ref, hf_ref,
                    fl_blk_ref, fl_lane_ref, at_blk_ref, at_lane_ref,
                    fs_blk_n_ref, fs_lane_n_ref, fs_blk_f_ref, fs_lane_f_ref,
                    af_blk_n0_ref, af_lane_n0_ref, af_blk_f0_ref,
                    af_lane_f0_ref, af_blk_n1_ref, af_lane_n1_ref,
                    af_blk_f1_ref, af_lane_f1_ref,
                    idp_blk_ref, idp_lane_ref,
                    id2p_blk_ref, id2p_lane_ref, slotcov_ref,
                    x_out_ref, stats_ref,
                    ascr, bscr, dinv_scr, ab0_scr, ab1_scr,
                    chain_scr, dlr_scr, fact_scr, fill_scr, cg_scr):
    """Slot/path-space matrices and vectors are PYTHON TUPLES of (nb,128)
    planes (m[3i+j], v[i]); chain space keeps pallas_cg's stacked layout.
    Rounds and levels run as fori_loops with dynamic shifts and dynamic
    mask slices — the factorization graph is compiled ONCE per loop body,
    not unrolled, which keeps Mosaic compile time bounded. Per-round PCR
    coefficients live in VMEM scratch (ascr/bscr), the decoupled block
    inverses in dinv_scr, attachment couplings in ab0/ab1_scr."""
    f32 = jnp.float32
    from .pallas_cg import JUMP_CHUNK

    # ---------------- tuple-of-planes 3x3 algebra ----------------
    def read9(ref, nb, base=0):
        return tuple(ref[pl.ds(base + k * nb, nb)] for k in range(9))

    def read9_dyn(ref, nb, base):
        return tuple(ref[pl.ds(base + k * nb, nb)] for k in range(9))

    def write9(ref, nb, base, M):
        for k in range(9):
            ref[pl.ds(base + k * nb, nb)] = M[k]

    def read3(ref, nb, base=0):
        return tuple(ref[pl.ds(base + k * nb, nb)] for k in range(3))

    def write3(ref, nb, base, v):
        for k in range(3):
            ref[pl.ds(base + k * nb, nb)] = v[k]

    def m_t(M):
        return (M[0], M[3], M[6], M[1], M[4], M[7], M[2], M[5], M[8])

    def mm(A, B):
        return tuple(
            A[3 * i + 0] * B[0 + j] + A[3 * i + 1] * B[3 + j]
            + A[3 * i + 2] * B[6 + j]
            for i in range(3) for j in range(3))

    def mv(M, v):
        return tuple(M[3 * i] * v[0] + M[3 * i + 1] * v[1]
                     + M[3 * i + 2] * v[2] for i in range(3))

    def madd(A, B):
        return tuple(a + b for a, b in zip(A, B))

    def msub(A, B):
        return tuple(a - b for a, b in zip(A, B))

    def mneg(A):
        return tuple(-a for a in A)

    def mscale(A, m):
        return tuple(a * m for a in A)

    def inv9(M):
        (a, b, c, d, e, f, g, h, i) = M
        A = e * i - f * h
        Bm = -(d * i - f * g)
        C = d * h - e * g
        det = a * A + b * Bm + c * C
        det = jnp.where(det != 0, det, 1.0)
        return (A / det, -(b * i - c * h) / det, (b * f - c * e) / det,
                Bm / det, (a * i - c * g) / det, -(a * f - c * d) / det,
                C / det, -(a * h - b * g) / det, (a * e - b * d) / det)

    def shift_p(x, s):
        """plane-wise y[slot i] = x[slot i+s] for ANY s (including the
        >= 128 shifts long-path PCR rounds need: s = q*128 + t rolls lanes
        by t and rows by q or q+1 selected per lane; s may be traced);
        cross-boundary reads are always annihilated by zero couplings."""
        nr = x.shape[0]
        t = s % BLOCK
        q = (s // BLOCK) % nr
        ln = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        a = pltpu.roll(x, (-t) % BLOCK, 1)
        b0 = pltpu.roll(a, (nr - q) % nr, 0)
        b1 = pltpu.roll(a, (nr - q - 1) % nr, 0)
        return jnp.where(ln >= BLOCK - t, b1, b0)

    def shift_m(x, s):
        nr = x.shape[0]
        t = s % BLOCK
        q = (s // BLOCK) % nr
        ln = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        a = pltpu.roll(x, t % BLOCK, 1)
        b0 = pltpu.roll(a, q, 0)
        b1 = pltpu.roll(a, (q + 1) % nr, 0)
        return jnp.where(ln < t, b1, b0)

    def tshift_p(T, s):
        return tuple(shift_p(t, s) for t in T)

    def tshift_m(T, s):
        return tuple(shift_m(t, s) for t in T)

    contract0 = (((0,), (0,)), ((), ()))
    RCHUNK = 1024

    def _move(blk_ref, lane_ref, id_ref_pair, src_plane, dst_shape,
              row0, n_rows):
        """One-hot move src_plane -> dst plane: gather src values at the
        table's positions (rows [row0, row0+n_rows)), then scatter them at
        the identity tables' positions (same row space). Row-chunked so
        only (RCHUNK,128) temporaries are ever live; tables stay in VMEM
        refs and are sliced per chunk."""
        out = jnp.zeros(dst_shape, f32)
        for c0 in range(0, n_rows, RCHUNK):
            n = min(RCHUNK, n_rows - c0)
            sl = pl.ds(row0 + c0, n)
            tmp = jnp.dot(blk_ref[sl, :].astype(f32), src_plane,
                          precision=HI, preferred_element_type=f32)
            vals = jnp.sum(tmp * lane_ref[sl, :].astype(f32), axis=1,
                           keepdims=True)
            out = out + lax.dot_general(
                id_ref_pair[0][pl.ds(c0, n), :].astype(f32),
                id_ref_pair[1][pl.ds(c0, n), :].astype(f32) * vals,
                contract0, precision=HI, preferred_element_type=f32)
        return out

    def _move_back(blk_ref, lane_ref, id_ref_pair, src_plane, dst_shape,
                   row0, n_rows):
        """Transpose direction: rows' values come from the identity tables
        (src plane), and scatter at the blk/lane tables' positions."""
        out = jnp.zeros(dst_shape, f32)
        for c0 in range(0, n_rows, RCHUNK):
            n = min(RCHUNK, n_rows - c0)
            sl = pl.ds(row0 + c0, n)
            isl = pl.ds(c0, n)
            tmp = jnp.dot(id_ref_pair[0][isl, :].astype(f32), src_plane,
                          precision=HI, preferred_element_type=f32)
            vals = jnp.sum(tmp * id_ref_pair[1][isl, :].astype(f32), axis=1,
                           keepdims=True)
            out = out + lax.dot_general(
                blk_ref[sl, :].astype(f32),
                lane_ref[sl, :].astype(f32) * vals,
                contract0, precision=HI, preferred_element_type=f32)
        return out

    def gather_vec(blk_ref, lane_ref, dst_id, v, dst_nb, row0=0,
                   n_rows=None):
        n_rows = n_rows if n_rows is not None else blk_ref.shape[0]
        return tuple(_move(blk_ref, lane_ref, dst_id, comp,
                           (dst_nb, BLOCK), row0, n_rows) for comp in v)

    def scatter_vec(blk_ref, lane_ref, src_id, v, dst_nb, row0=0,
                    n_rows=None):
        n_rows = n_rows if n_rows is not None else blk_ref.shape[0]
        return tuple(_move_back(blk_ref, lane_ref, src_id, comp,
                                (dst_nb, BLOCK), row0, n_rows)
                     for comp in v)

    def gather_field(blk_ref, lane_ref, dst_id, M, dst_nb, transpose=False,
                     row0=0, n_rows=None):
        n_rows = n_rows if n_rows is not None else blk_ref.shape[0]
        idx = (lambda i, j: 3 * j + i) if transpose else \
            (lambda i, j: 3 * i + j)
        return tuple(_move(blk_ref, lane_ref, dst_id, M[idx(i, j)],
                           (dst_nb, BLOCK), row0, n_rows)
                     for i in range(3) for j in range(3))

    def scatter_field(blk_ref, lane_ref, src_id, M, dst_nb, transpose=False,
                      row0=0, n_rows=None):
        n_rows = n_rows if n_rows is not None else blk_ref.shape[0]
        idx = (lambda i, j: 3 * j + i) if transpose else \
            (lambda i, j: 3 * i + j)
        return tuple(_move_back(blk_ref, lane_ref, src_id, M[idx(i, j)],
                                (dst_nb, BLOCK), row0, n_rows)
                     for i in range(3) for j in range(3))

    # ---------------- chain-space matvec (as in pallas_cg) ----------------
    # active-masked chain coefficients are computed ONCE into chain_scr and
    # re-read per matvec: holding them (or freem/uk) as live values across
    # the whole kernel forces the register allocator to give each of these
    # multi-hundred-vreg planes a dedicated VMEM spill slot (90+ MB of
    # spill scratch at 309k DOF — the difference between fitting VMEM and
    # not)
    cact = cact_ref[:]
    chain_scr[pl.ds(0, 3 * nbc)] = cn_ref[:] * cact
    chain_scr[pl.ds(3 * nbc, 3 * nbc)] = ckax_ref[:] * cact
    chain_scr[pl.ds(6 * nbc, 3 * nbc)] = ckbd_ref[:] * cact
    c_rows = 3 * nbc
    c_lane = lax.broadcasted_iota(jnp.int32, (c_rows, BLOCK), 1)
    last_lane = c_lane == BLOCK - 1
    first_lane = c_lane == 0
    n_chunks = jp // JUMP_CHUNK

    def roll(x, shift, axis):
        return pltpu.roll(x, shift % x.shape[axis], axis)

    def shift_up_c(x):
        a = roll(x, -1, 1)
        b = roll(a, -1, 0)
        return jnp.where(last_lane, b, a)

    def shift_down_c(x):
        a = roll(x, 1, 1)
        b = roll(a, 1, 0)
        return jnp.where(first_lane, b, a)

    def plane_sum(s):
        return (s[0 * nbc:1 * nbc] + s[1 * nbc:2 * nbc]
                + s[2 * nbc:3 * nbc])

    def tile3c(p):
        return jnp.concatenate([p, p, p], axis=0)

    def matvec_raw(u):
        cn = chain_scr[pl.ds(0, 3 * nbc)]
        ckax = chain_scr[pl.ds(3 * nbc, 3 * nbc)]
        ckbd = chain_scr[pl.ds(6 * nbc, 3 * nbc)]
        d = u - shift_up_c(u)
        nd = tile3c(plane_sum(cn * d))
        fx = ckax * nd * cn + ckbd * (d - nd * cn)
        out = fx - shift_down_c(fx)
        u_planes = (u[0 * nbc:1 * nbc], u[1 * nbc:2 * nbc],
                    u[2 * nbc:3 * nbc])

        def chunk_body(ci, out):
            sl2 = pl.ds(ci * 2 * JUMP_CHUNK, 2 * JUMP_CHUNK)
            slp = pl.ds(ci * JUMP_CHUNK, JUMP_CHUNK)
            ab_blk = ab_blk_ref[sl2, :].astype(f32)
            ab_lane = ab_lane_ref[sl2, :].astype(f32)
            jscal = jscal_ref[slp, :]
            jact1 = jact_ref[slp, :][:, 0:1]
            jn = (jscal[:, 0:1], jscal[:, 1:2], jscal[:, 2:3])
            jkax = jscal[:, 3:4] * jact1
            jkbd = jscal[:, 4:5] * jact1
            dj = []
            for k in range(3):
                t = jnp.dot(ab_blk, u_planes[k], precision=HI,
                            preferred_element_type=f32)
                sel = jnp.sum(t * ab_lane, axis=1, keepdims=True)
                dj.append(sel[:JUMP_CHUNK] - sel[JUMP_CHUNK:])
            ndj = jn[0] * dj[0] + jn[1] * dj[1] + jn[2] * dj[2]
            diffs = []
            for k in range(3):
                fj = jkax * ndj * jn[k] + jkbd * (dj[k] - ndj * jn[k])
                fj2 = jnp.concatenate([fj, -fj], axis=0)
                diffs.append(
                    lax.dot_general(ab_blk, ab_lane * fj2, contract0,
                                    precision=HI,
                                    preferred_element_type=f32))
            return out + jnp.concatenate(diffs, axis=0)

        return lax.fori_loop(0, n_chunks, chunk_body, out)

    def matvec(u):
        freem = freem_ref[:]
        uf = freem * u
        return freem * (matvec_raw(uf) + reg * uf) + (1.0 - freem) * u

    # ---------------- tree factorization (slot space) ----------------
    idp = (idp_blk_ref, idp_lane_ref)
    id2p = (id2p_blk_ref, id2p_lane_ref)
    pp = npb * BLOCK
    ma0_m = ma_ref[0:npb]
    ma1_m = ma_ref[npb:2 * npb]
    zero_s = jnp.zeros((nbt, BLOCK), f32)
    zero_p = jnp.zeros((npb, BLOCK), f32)

    ascr[:] = jnp.zeros_like(ascr)
    bscr[:] = jnp.zeros_like(bscr)
    dinv_scr[:] = jnp.zeros_like(dinv_scr)

    def pcr_update(rv, lvm):
        """Masked PCR r-updates (scratch coefficients) + diagonal solve."""
        def round_body(k, rv):
            s = jnp.int32(1) << k
            a = read9_dyn(ascr, nbt, k * 9 * nbt)
            b = read9_dyn(bscr, nbt, k * 9 * nbt)
            upd = madd(mv(a, tshift_m(rv, s)), mv(b, tshift_p(rv, s)))
            return tuple(r - lvm * u for r, u in zip(rv, upd))

        rv = lax.fori_loop(0, r_star, round_body, rv)
        dinv = read9(dinv_scr, nbt)
        return tuple(lvm * y for y in mv(dinv, rv))

    # factorization state lives in SCRATCH REFS, not loop carries: each
    # loop-carried 9-tuple of slot planes is hundreds of vregs and gets a
    # dedicated spill slot otherwise (see the chain_scr note above).
    # dlr_scr holds [Dc; Lw; Rw] at bases 0 / 9*nbt / 18*nbt; fact_scr
    # holds [B9; dacc9] at bases 0 / 9*nbt; fill_scr holds fill9.
    def level_body(li, _):
        lvm = lvm_ref[pl.ds(li * nbt, nbt)]
        pvm = pvm_ref[pl.ds(li * npb, npb)]

        # PCR coefficient recurrence for this level's rows
        def round_body(k, _):
            s = jnp.int32(1) << k
            Dc = read9_dyn(dlr_scr, nbt, 0)
            Lw = read9_dyn(dlr_scr, nbt, 9 * nbt)
            Rw = read9_dyn(dlr_scr, nbt, 18 * nbt)
            dinv = inv9(Dc)
            a = mscale(mm(Lw, tshift_m(dinv, s)), lvm)
            b = mscale(mm(Rw, tshift_p(dinv, s)), lvm)
            base = k * 9 * nbt
            write9(ascr, nbt, base, madd(read9_dyn(ascr, nbt, base), a))
            write9(bscr, nbt, base, madd(read9_dyn(bscr, nbt, base), b))
            write9(dlr_scr, nbt, 0,
                   msub(Dc, madd(mm(a, tshift_m(Rw, s)),
                                 mm(b, tshift_p(Lw, s)))))
            write9(dlr_scr, nbt, 9 * nbt, mneg(mm(a, tshift_m(Lw, s))))
            write9(dlr_scr, nbt, 18 * nbt, mneg(mm(b, tshift_p(Rw, s))))
            return 0

        B9 = read9(fact_scr, nbt, 0)
        write9(dlr_scr, nbt, 0,
               madd(read9(d9_ref, nbt), read9(fact_scr, nbt, 9 * nbt)))
        write9(dlr_scr, nbt, 9 * nbt, m_t(B9))
        write9(dlr_scr, nbt, 18 * nbt, tshift_p(B9, 1))
        del B9
        lax.fori_loop(0, r_star, round_body, 0)
        write9(dinv_scr, nbt, 0,
               madd(read9(dinv_scr, nbt),
                    mscale(inv9(read9_dyn(dlr_scr, nbt, 0)), lvm)))

        # attachment couplings for this level's paths
        fill9 = read9(fill_scr, npb, 0)
        a0 = madd(tuple(p * ma0_m for p in read9(k3a0_ref, npb)),
                  madd(gather_field(af_blk_n0_ref, af_lane_n0_ref,
                                    idp, fill9, npb),
                       gather_field(af_blk_f0_ref, af_lane_f0_ref,
                                    idp, fill9, npb, transpose=True)))
        a1 = madd(tuple(p * ma1_m for p in read9(k3a1_ref, npb)),
                  madd(gather_field(af_blk_n1_ref, af_lane_n1_ref,
                                    idp, fill9, npb),
                       gather_field(af_blk_f1_ref, af_lane_f1_ref,
                                    idp, fill9, npb, transpose=True)))
        del fill9
        a0 = mscale(a0, pvm)
        a1 = mscale(a1, pvm)
        write9(ab0_scr, npb, 0, madd(read9(ab0_scr, npb), a0))
        write9(ab1_scr, npb, 0, madd(read9(ab1_scr, npb), a1))

        # corner blocks of T^{-1}: 6 unit-block columns via masked PCR.
        # Ms[(end, tag)][3*i+c]: component i of column c, read at end slots
        Ms = {}
        for ref, tag in ((fm_ref, "f"), (lm_ref, "l")):
            cols0, cols1 = [], []
            for c in range(3):
                blkmask = ref[:]
                rhs = tuple(blkmask if cc == c else zero_s
                            for cc in range(3))
                x = pcr_update(rhs, lvm)
                g = gather_vec(fl_blk_ref, fl_lane_ref, id2p, x, 2 * npb)
                cols0.append(tuple(comp[:npb] for comp in g))
                cols1.append(tuple(comp[npb:] for comp in g))
            for end, cols in (("f", cols0), ("l", cols1)):
                Ms[(end, tag)] = tuple(cols[c][i]
                                       for i in range(3) for c in range(3))

        # Schur corrections dG_s = -B_s M_ss B_s^T; fill = -B_f M_fl B_l^T
        dg0 = mneg(mm(mm(a0, Ms[("f", "f")]), m_t(a0)))
        dg1 = mneg(mm(mm(a1, Ms[("l", "l")]), m_t(a1)))
        write9(fact_scr, nbt, 9 * nbt,
               madd(read9(fact_scr, nbt, 9 * nbt),
                    madd(scatter_field(at_blk_ref, at_lane_ref, idp,
                                       dg0, nbt, row0=0, n_rows=pp),
                         scatter_field(at_blk_ref, at_lane_ref, idp,
                                       dg1, nbt, row0=pp, n_rows=pp))))
        fb = mscale(mneg(mm(mm(a0, Ms[("f", "l")]), m_t(a1))),
                    hf_ref[:] * pvm)
        write9(fill_scr, npb, 0, madd(read9(fill_scr, npb, 0), fb))
        write9(fact_scr, nbt, 0, madd(read9(fact_scr, nbt, 0), madd(
            scatter_field(fs_blk_n_ref, fs_lane_n_ref, idp, fb, nbt),
            scatter_field(fs_blk_f_ref, fs_lane_f_ref, idp, fb, nbt,
                          transpose=True))))
        return 0

    write9(fact_scr, nbt, 0,
           tuple(p * ml_ref[:] for p in read9(k3l_ref, nbt)))
    write9(fact_scr, nbt, 9 * nbt, tuple(zero_s for _ in range(9)))
    write9(fill_scr, npb, 0, tuple(zero_p for _ in range(9)))
    write9(ab0_scr, npb, 0, tuple(zero_p for _ in range(9)))
    write9(ab1_scr, npb, 0, tuple(zero_p for _ in range(9)))
    lax.fori_loop(0, n_levels, level_body, 0)

    # ---------------- preconditioner application ----------------
    # unified layout: chain position s == slot s, so the transforms are a
    # row-slice and a padded concat — zero matmuls, zero tables (round 1
    # spent its VMEM ceiling AND most of its per-iteration matmul FLOPs
    # exactly here)
    slotcov = slotcov_ref[:]

    def chain_to_slots(r_chain):
        return tuple(r_chain[c * nbc:c * nbc + nbt] for c in range(3))

    if nbc > nbt:
        zpad = jnp.zeros((nbc - nbt, BLOCK), f32)

        def slots_to_chain(v):
            return jnp.concatenate([jnp.concatenate([v[c], zpad], axis=0)
                                    for c in range(3)], axis=0)
    else:
        def slots_to_chain(v):
            return jnp.concatenate(list(v), axis=0)

    def precond(r_chain):
        rs = chain_to_slots(r_chain)
        zs3 = (zero_s, zero_s, zero_s)
        attB0 = read9(ab0_scr, npb)
        attB1 = read9(ab1_scr, npb)

        def fwd_body(li, c):
            rs, y_all = c
            lvm = lvm_ref[pl.ds(li * nbt, nbt)]
            pvm = pvm_ref[pl.ds(li * npb, npb)]
            y = pcr_update(rs, lvm)
            y_all = madd(y_all, y)
            g = gather_vec(fl_blk_ref, fl_lane_ref, id2p, y, 2 * npb)
            g0 = tuple(comp[:npb] for comp in g)
            g1 = tuple(comp[npb:] for comp in g)
            corr0 = tuple(pvm * z for z in mv(attB0, g0))
            corr1 = tuple(pvm * z for z in mv(attB1, g1))
            sc0 = scatter_vec(at_blk_ref, at_lane_ref, idp, corr0, nbt,
                              row0=0, n_rows=pp)
            sc1 = scatter_vec(at_blk_ref, at_lane_ref, idp, corr1, nbt,
                              row0=pp, n_rows=pp)
            rs = tuple(r - a - b for r, a, b in zip(rs, sc0, sc1))
            return (rs, y_all)

        rs, y_all = lax.fori_loop(0, n_levels, fwd_body, (rs, zs3))

        def bwd_body(i, u_all):
            li = n_levels - 1 - i
            lvm = lvm_ref[pl.ds(li * nbt, nbt)]
            pvm = pvm_ref[pl.ds(li * npb, npb)]
            uj = gather_vec(at_blk_ref, at_lane_ref, id2p, u_all,
                            2 * npb)
            uj0 = tuple(comp[:npb] for comp in uj)
            uj1 = tuple(comp[npb:] for comp in uj)
            z0 = tuple(pvm * z for z in mv(m_t(attB0), uj0))
            z1 = tuple(pvm * z for z in mv(m_t(attB1), uj1))
            zs0 = scatter_vec(fl_blk_ref, fl_lane_ref, idp, z0, nbt,
                              row0=0, n_rows=pp)
            zs1 = scatter_vec(fl_blk_ref, fl_lane_ref, idp, z1, nbt,
                              row0=pp, n_rows=pp)
            zs = madd(zs0, zs1)
            u = tuple(lvm * (ya - pc)
                      for ya, pc in zip(y_all, pcr_update(zs, lvm)))
            return madd(u_all, u)

        u_all = lax.fori_loop(0, n_levels, bwd_body, zs3)
        return slots_to_chain(u_all) \
            + r_chain * (1.0 - slotcov_ref[:])

    # ---------------- CG ----------------
    # x, r, p live in scratch refs (cg_scr at bases 0/3nbc/6nbc); only the
    # scalars ride the while carry — same spill-slot rationale as above
    def dot(a, b):
        return jnp.sum(a * b)

    def xv():
        return cg_scr[pl.ds(0, 3 * nbc)]

    def rv():
        return cg_scr[pl.ds(3 * nbc, 3 * nbc)]

    def pv():
        return cg_scr[pl.ds(6 * nbc, 3 * nbc)]

    freem = freem_ref[:]
    uk = uk_ref[:]
    b = (1.0 - freem) * uk - freem * matvec_raw(uk)
    bnorm2 = dot(freem * b, freem * b)
    tol2 = rtol * rtol * bnorm2

    cg_scr[pl.ds(0, 3 * nbc)] = freem * x0_ref[:] + (1.0 - freem) * uk
    cg_scr[pl.ds(3 * nbc, 3 * nbc)] = b - matvec(xv())
    del freem, uk, b
    z0 = precond(rv())
    rz0 = dot(rv(), z0)
    rr0 = dot(rv(), rv())
    cg_scr[pl.ds(6 * nbc, 3 * nbc)] = z0
    del z0

    def cond(s):
        rr, k, rz = s
        return jnp.logical_and(k < max_iter, rr > tol2)

    def body(s):
        rr, k, rz = s
        ap = matvec(pv())
        pap = dot(pv(), ap)
        alpha = jnp.where(pap > 0, rz / jnp.where(pap > 0, pap, 1.0), 0.0)
        cg_scr[pl.ds(0, 3 * nbc)] = xv() + alpha * pv()
        cg_scr[pl.ds(3 * nbc, 3 * nbc)] = rv() - alpha * ap
        z = precond(rv())
        rz_new = dot(rv(), z)
        beta = jnp.where(rz > 0, rz_new / jnp.where(rz > 0, rz, 1.0), 0.0)
        cg_scr[pl.ds(6 * nbc, 3 * nbc)] = z + beta * pv()
        return (dot(rv(), rv()), k + 1, rz_new)

    rr, k, rz = lax.while_loop(
        cond, body, (rr0, jnp.asarray(0, jnp.int32), rz0))

    x_out_ref[:] = xv()
    sl = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    stats = jnp.where(sl == 0, k.astype(f32),
                      jnp.where(sl == 1, jnp.sqrt(rr),
                                jnp.where(sl == 2, jnp.sqrt(tol2), 0.0)))
    stats_ref[:] = stats


# ---------------------------------------------------------------------------
# host wrapper
# ---------------------------------------------------------------------------

def pallas_tree_solve(model, chain_packed, tree_packed: PackedTreeData,
                      active, dy_top, dy_bot, x0, cfg: FeaConfig,
                      anchored=None):
    """One boundary-value solve: whole-PCG Pallas kernel with the in-kernel
    spanning-forest preconditioner."""
    from .bc import prescribed_values
    from .chain import plan_active_masks_bool
    from .pallas_cg import _pack_plane, _tile3, pack_vec3, plan_nb

    plan = model.chain
    tplan = model.tree
    n = model.n_nodes
    # chain planes were packed at nb_eff = max(plan_nb(n), NBt) so slot
    # space is a row-slice of chain space (model.py build order)
    nbc = chain_packed.cn.shape[0] // 3
    nbt = tree_packed.nbt
    npb = tree_packed.npb
    jp = chain_packed.jscal.shape[0]
    f32 = jnp.float32
    n_levels = tree_packed.n_levels
    r_star = max(tplan.meta.level_steps) if tplan.meta.level_steps else 0

    free = model.free_nodes if anchored is None \
        else jnp.logical_and(model.free_nodes, anchored)
    # one bool gather each for active/free, shared with the diag below
    chain_act_b, jump_act_b = plan_active_masks_bool(plan, active)
    free_chain_b = free[plan.perm]
    cact = _tile3(_pack_plane(chain_act_b.astype(f32), nbc))
    jact_col = jnp.pad(jump_act_b.astype(f32),
                       (0, jp - jump_act_b.shape[0]))
    jact = jnp.broadcast_to(jact_col[:, None], (jp, BLOCK))

    u_k = prescribed_values(model, dy_top, dy_bot).astype(f32)
    free3 = jnp.repeat(free_chain_b.astype(f32)[:, None], 3, axis=1)
    freem = pack_vec3(free3, nbc)
    uk_p = pack_vec3(u_k[plan.perm], nbc)
    x0_p = pack_vec3(x0.astype(f32)[plan.perm], nbc)

    # ---- per-solve slot-space numerics (XLA prep) ----
    conn = model.conn
    E = conn.shape[0]
    reg_pc = max(cfg.reg, cfg.tree_reg_rel * tplan.meta.k_scale)
    m_tree = active & tplan.tree_edge
    m_couple = (m_tree & free[conn[:, 0]] & free[conn[:, 1]]
                & (conn[:, 0] != conn[:, 1]))
    eye = jnp.eye(3, dtype=f32)
    S_tot = tplan.n_slots
    Sp = nbt * BLOCK
    if getattr(model, "tree_fast", None) is not None:
        # gather-free diagonal: chain shifts + small jump scatter; slots
        # ARE chain positions under the unified ordering, so slot
        # extraction is a slice (the old path's N-row scatter-adds plus
        # the Sp-row slot gather cost ~150 ms at 309k DOF)
        from .tree_jax import chain_tree_diag
        D_chain = chain_tree_diag(tplan, model.tree_fast, plan, active,
                                  free_chain_b,
                                  jnp.asarray(reg_pc, f32),
                                  chain_act_b, jump_act_b).astype(f32)
        # (9, Sp) planes (identity on padding rows) are ALREADY the d9
        # layout the kernel wants: reshape, no per-component slicing
        pad_eye = jnp.eye(3, dtype=f32).reshape(9, 1)
        Ds9 = jnp.concatenate(
            [D_chain[:, :S_tot],
             jnp.broadcast_to(pad_eye, (9, Sp - S_tot))], axis=1)
        Ds = None
    else:
        k3 = tplan.k3.astype(f32)
        k_eff = k3 * m_tree[:, None, None].astype(f32)
        D_nodes = jnp.zeros((n, 3, 3), f32)
        D_nodes = D_nodes.at[conn[:, 0]].add(k_eff)
        D_nodes = D_nodes.at[conn[:, 1]].add(k_eff)
        D_nodes = D_nodes + jnp.asarray(reg_pc, f32) * eye[None]
        D_nodes = jnp.where(free[:, None, None], D_nodes, eye[None])
        D_pad = jnp.concatenate([D_nodes, eye[None]])  # sentinel: identity
        Ds = D_pad[tree_packed.slot_node]              # (Sp,3,3)
    d9 = (Ds9.reshape(9 * nbt, BLOCK) if Ds is None else
          jnp.concatenate(
              [Ds[:, i, j].reshape(nbt, BLOCK) for i in range(3)
               for j in range(3)], axis=0))

    # bool gathers (1 byte/row), cast after — f32 row gathers are ~10x
    mc_pad = jnp.concatenate([m_couple, jnp.zeros((1,), bool)])
    ml = mc_pad[tree_packed.left_elem].astype(f32).reshape(nbt, BLOCK)
    ma = mc_pad[tree_packed.att_elem].astype(f32).reshape(2 * npb, BLOCK)

    kernel = functools.partial(
        _tree_cg_kernel, nbc, nbt, npb, n_levels, r_star, jp,
        cfg.max_iter, np.float32(cfg.rtol), np.float32(cfg.reg))
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    tp = tree_packed
    inputs = (uk_p, x0_p, freem, cact, jact,
              chain_packed.cn, chain_packed.ckax, chain_packed.ckbd,
              chain_packed.ab_blk, chain_packed.ab_lane,
              chain_packed.jscal,
              d9, ml, ma,
              tp.k3l, tp.lvm, tp.fm, tp.lm,
              tp.k3a0, tp.k3a1, tp.pvm, tp.hf,
              tp.fl_blk, tp.fl_lane, tp.at_blk, tp.at_lane,
              tp.fs_blk_n, tp.fs_lane_n, tp.fs_blk_f, tp.fs_lane_f,
              tp.af_blk_n0, tp.af_lane_n0, tp.af_blk_f0, tp.af_lane_f0,
              tp.af_blk_n1, tp.af_lane_n1, tp.af_blk_f1, tp.af_lane_f1,
              tp.idp_blk, tp.idp_lane,
              tp.id2p_blk, tp.id2p_lane, tp.slotcov)
    x_p, stats = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((3 * nbc, BLOCK), f32),
                   jax.ShapeDtypeStruct((1, 128), f32)),
        in_specs=[vmem() for _ in range(len(inputs))],
        out_specs=(vmem(), vmem()),
        scratch_shapes=[
            pltpu.VMEM((max(r_star, 1) * 9 * nbt, BLOCK), f32),  # ascr
            pltpu.VMEM((max(r_star, 1) * 9 * nbt, BLOCK), f32),  # bscr
            pltpu.VMEM((9 * nbt, BLOCK), f32),                   # dinv
            pltpu.VMEM((9 * npb, BLOCK), f32),                   # ab0
            pltpu.VMEM((9 * npb, BLOCK), f32),                   # ab1
            pltpu.VMEM((9 * nbc, BLOCK), f32),   # chain coeffs (masked)
            pltpu.VMEM((27 * nbt, BLOCK), f32),  # Dc/Lw/Rw recurrence
            pltpu.VMEM((18 * nbt, BLOCK), f32),  # B9/dacc9
            pltpu.VMEM((9 * npb, BLOCK), f32),   # fill9
            pltpu.VMEM((9 * nbc, BLOCK), f32),   # CG x/r/p
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(*inputs)

    from .pallas_cg import unpack_vec3
    x = unpack_vec3(x_p, n, nbc)[plan.inv_perm]
    iters = stats[0, 0].astype(jnp.int32)
    rnorm = stats[0, 1]
    return SolveResult(x=x.astype(model.coords.dtype), iters=iters,
                       resnorm=rnorm, converged=rnorm <= stats[0, 2])
