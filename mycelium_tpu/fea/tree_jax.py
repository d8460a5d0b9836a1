"""Device (JAX) implementation of the spanning-forest preconditioner.

Everything here consumes the static schedule built by tree.build_tree_schedule
(host, once per mesh) converted to a device pytree (TreePlan): all levels'
slots concatenated into ONE global slot space so inter-level Schur flows are
single scatters, and each level's block-tridiagonal solves run as parallel
cyclic reduction (PCR) — log2(max path length) rounds of shifted 3x3 block
products, no sequential recurrences, no data-dependent shapes.

  factor (once per solve): tree_factor(plan, k3, active, free, reg)
      -> TreeFactor pytree (PCR coefficients + attachment couplings)
  apply (per CG iteration): tree_apply(plan, factor, r)
      -> z = K_tree^{-1} r   (pinned rows pass through)

The oracle for both is the numpy implementation in tree.py (tests compare
them element-wise). See tree.py's module docstring for why this exists:
the forest solve takes CG on the archived mesh from 872 iterations to 9.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .tree import KIND_ELEM, KIND_FILL, KIND_NONE, TreeSchedule


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class TreeMeta:
    """Static shape info (hashable; part of the jit cache key)."""
    level_offsets: tuple        # slot-space offset per level, + total
    path_offsets: tuple         # path-space offset per level, + total
    level_steps: tuple          # PCR rounds per level
    k_scale: float = 1.0        # median element stiffness (reg floor ref)
    n_pcr: int = -1             # levels eliminated by PCR; the remaining
                                # (tiny) levels' slots are solved as ONE
                                # dense junction-Schur inverse. -1 = all
                                # levels PCR (no dense tail).


def n_pcr_levels(meta: TreeMeta) -> int:
    return len(meta.level_steps) if meta.n_pcr < 0 else meta.n_pcr


def pcr_split(sizes, dense_tail: int) -> int:
    """Number of leading levels kept on PCR: the trailing levels whose
    combined slot count fits ``dense_tail`` are folded into the dense
    junction solve. Their per-level shapes are tiny (9/2-slot at 103k
    nodes) and the unrolled PCR chains over them stall the XLA TPU
    compile superlinearly past ~50k nodes (measured: 33k nodes jit the
    full factorization in 14 s, 103k nodes >40 min; the 4-level prefix
    compiles in 18 s and adding the 9-slot level 4 hangs it)."""
    if dense_tail <= 0:
        return len(sizes)
    suffix = 0
    k = len(sizes)
    while k > 0 and suffix + sizes[k - 1] <= dense_tail:
        suffix += sizes[k - 1]
        k -= 1
    return k


class TreePlan(NamedTuple):
    """Device form of the static schedule. Slot/path arrays of ALL levels
    are concatenated; meta.level_offsets/path_offsets delimit them."""
    meta: TreeMeta
    tree_edge: jnp.ndarray    # (E,) bool — spanning-forest membership
    k3: jnp.ndarray           # (E,3,3) element coupling stiffnesses
    slots: jnp.ndarray        # (S,) int32 node id per global slot
    # left-edge (slot i-1 -- slot i) source; sentinels: elem=E, fill=P
    left_elem: jnp.ndarray    # (S,) int32
    left_fill: jnp.ndarray    # (S,) int32 fill id == producing path index
    left_fill_flip: jnp.ndarray  # (S,) bool
    first_gpos: jnp.ndarray   # (P,) int32 global slot index of path start
    last_gpos: jnp.ndarray    # (P,) int32
    att_elem: jnp.ndarray     # (P, 2) int32 (sentinel E)
    att_fill: jnp.ndarray     # (P, 2) int32 (sentinel P)
    att_flip: jnp.ndarray     # (P, 2) bool
    att_tgt: jnp.ndarray      # (P, 2) int32 global slot of junction
                              # (sentinel S when no attachment)
    has_fill: jnp.ndarray     # (P,) bool — path produces a fill edge
    # dense-tail assembly tables: tree-element edges whose BOTH endpoint
    # slots live in the tail levels (slot >= level_offsets[n_pcr]),
    # as (element id, local tail row i, local tail row j)
    dense_eid: jnp.ndarray = None   # (Ed,) int32
    dense_i: jnp.ndarray = None     # (Ed,) int32
    dense_j: jnp.ndarray = None     # (Ed,) int32

    @property
    def n_slots(self) -> int:
        return self.slots.shape[0]

    @property
    def n_paths(self) -> int:
        return self.first_gpos.shape[0]


class TreeFactor(NamedTuple):
    """Per-solve numeric factorization (pytree of device arrays).

    PCR coefficients cover only the first meta.n_pcr levels; the tail
    levels' slots are solved through ``sinv``, the dense inverse of their
    junction-Schur system."""
    # PCR coefficients, one (steps, S_l, 3, 3) pair per PCR level
    alphas: tuple
    betas: tuple
    dinv: jnp.ndarray         # (S_pcr, 3, 3) final decoupled block inverses
    att_b: jnp.ndarray        # (P_pcr, 2, 3, 3) attachment couplings B[j,s]
    sinv: jnp.ndarray = None  # (3*Sd, 3*Sd) dense tail inverse (None when
                              # the tail is empty)


def build_tree_plan(schedule: TreeSchedule, k3: np.ndarray,
                    dtype, dense_tail: int = 0) -> TreePlan:
    """Convert the host schedule (+ element couplings) to the device
    layout. ``dense_tail`` > 0 folds the trailing levels whose combined
    slot count fits it into one dense junction solve (see pcr_split)."""
    lv_off, pa_off = [0], [0]
    steps = []
    slots, le, lf, lff = [], [], [], []
    fgp, lgp = [], []
    a_e, a_f, a_fl, a_tg = [], [], [], []
    hasf = []
    E = len(schedule.conn)

    # fill id == global producing-path index; build the map first
    fill_to_path = {}
    p_base = 0
    for lv in schedule.levels:
        for p, f in enumerate(lv.fill_out):
            if f >= 0:
                fill_to_path[int(f)] = p_base + p
        p_base += len(lv.first_pos)
    P_tot = p_base

    s_base = 0
    p_base = 0
    lv_starts = []
    for lv in schedule.levels:
        lv_starts.append(s_base)
        s_base += len(lv.slots)
        p_base += len(lv.first_pos)
    S_tot = s_base

    s_base = p_base = 0
    for lv in schedule.levels:
        S = len(lv.slots)
        P = len(lv.first_pos)
        slots.append(lv.slots)
        is_e = lv.left_kind == KIND_ELEM
        is_f = lv.left_kind == KIND_FILL
        le.append(np.where(is_e, lv.left_id, E).astype(np.int32))
        lf.append(np.where(
            is_f, [fill_to_path.get(int(i), P_tot) for i in lv.left_id],
            P_tot).astype(np.int32))
        lff.append(lv.left_flip & is_f)
        fgp.append(lv.first_pos.astype(np.int64) + s_base)
        lgp.append(lv.last_pos.astype(np.int64) + s_base)
        ae = np.where(lv.att_kind == KIND_ELEM, lv.att_id, E)
        af = np.where(
            lv.att_kind == KIND_FILL,
            np.vectorize(lambda i: fill_to_path.get(int(i), P_tot))(
                lv.att_id) if lv.att_id.size else lv.att_id,
            P_tot)
        a_e.append(ae.astype(np.int32))
        a_f.append(af.astype(np.int32))
        a_fl.append(lv.att_flip)
        tg = np.where(lv.att_kind == KIND_NONE, S_tot,
                      np.asarray([[lv_starts[l] for l in row]
                                  for row in lv.att_level])
                      + lv.att_pos)
        a_tg.append(tg.astype(np.int32))
        hasf.append(lv.fill_out >= 0)
        # PCR rounds: enough for the longest path at this level
        lens = lv.last_pos - lv.first_pos + 1
        maxlen = int(lens.max()) if len(lens) else 1
        steps.append(max(int(np.ceil(np.log2(max(maxlen, 1)))), 0))
        lv_off.append(lv_off[-1] + S)
        pa_off.append(pa_off[-1] + P)
        s_base += S

    cat = lambda xs, dt: jnp.asarray(  # noqa: E731
        np.concatenate(xs).astype(dt, copy=False))

    k3_np = np.asarray(k3)
    k_scale = (float(np.median(np.trace(k3_np, axis1=1, axis2=2) / 3.0))
               if len(k3_np) else 1.0)

    if not schedule.levels:   # fully gripped scene: nothing to eliminate
        z1 = jnp.zeros((0,), jnp.int32)
        z2 = jnp.zeros((0, 2), jnp.int32)
        return TreePlan(
            meta=TreeMeta(level_offsets=(0,), path_offsets=(0,),
                          level_steps=(), k_scale=k_scale, n_pcr=0),
            tree_edge=jnp.asarray(schedule.tree_edge),
            k3=jnp.asarray(np.asarray(k3, dtype)),
            slots=z1, left_elem=z1, left_fill=z1,
            left_fill_flip=jnp.zeros((0,), bool),
            first_gpos=z1, last_gpos=z1,
            att_elem=z2, att_fill=z2,
            att_flip=jnp.zeros((0, 2), bool), att_tgt=z2,
            has_fill=jnp.zeros((0,), bool),
            dense_eid=z1, dense_i=z1, dense_j=z1)

    sizes = [lv_off[i + 1] - lv_off[i] for i in range(len(lv_off) - 1)]
    n_pcr = pcr_split(sizes, dense_tail)
    t0 = lv_off[n_pcr]
    slots_cat = np.concatenate(slots).astype(np.int64)
    node_to_slot = np.full(len(schedule.free), -1, np.int64)
    node_to_slot[slots_cat] = np.arange(len(slots_cat))
    conn_np = np.asarray(schedule.conn, np.int64)
    te = np.nonzero(schedule.tree_edge)[0]
    sa = node_to_slot[conn_np[te, 0]]
    sb = node_to_slot[conn_np[te, 1]]
    both = (sa >= t0) & (sb >= t0)
    return TreePlan(
        meta=TreeMeta(level_offsets=tuple(lv_off),
                      path_offsets=tuple(pa_off),
                      level_steps=tuple(steps), k_scale=k_scale,
                      n_pcr=n_pcr),
        tree_edge=jnp.asarray(schedule.tree_edge),
        k3=jnp.asarray(np.asarray(k3, dtype)),
        slots=cat(slots, jnp.int32),
        left_elem=cat(le, jnp.int32),
        left_fill=cat(lf, jnp.int32),
        left_fill_flip=cat(lff, bool),
        first_gpos=cat(fgp, jnp.int32),
        last_gpos=cat(lgp, jnp.int32),
        att_elem=cat(a_e, jnp.int32),
        att_fill=cat(a_f, jnp.int32),
        att_flip=cat(a_fl, bool),
        att_tgt=cat(a_tg, jnp.int32),
        has_fill=cat(hasf, bool),
        dense_eid=jnp.asarray(te[both].astype(np.int32)),
        dense_i=jnp.asarray((sa[both] - t0).astype(np.int32)),
        dense_j=jnp.asarray((sb[both] - t0).astype(np.int32)),
    )


def _inv3(m):
    """Batched 3x3 inverse via adjugate (matches model.invert_blocks)."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(det != 0, det, 1.0)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), (b * f - c * e)], -1),
        jnp.stack([B, (a * i - c * g), -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), (a * e - b * d)], -1),
    ], -2)
    return adj / det[..., None, None]


def _shift(x, k):
    """y[i] = x[i+k] along axis 0, rolling (wrap contributions are always
    multiplied by couplings that are zero across path boundaries)."""
    return jnp.roll(x, -k, axis=0)


HI = jax.lax.Precision.HIGHEST   # TPU einsum defaults to bf16 passes;
                                  # kept for the true-matvec dense tail

# component-unrolled block algebra (see blocks.py: the einsum forms
# lower to dot_generals whose TPU layouts pad 3x3 operands 56.9x)
from .blocks import mm3 as _mm, mtv3 as _mtv3, mv3 as _mv3  # noqa: E402


def _pcr_coeffs(D, B, steps):
    """PCR coefficient recurrence on a block tridiagonal with row i
    couplings L_i = B[i]^T (to i-1) and R_i = B[i+1] (to i+1). Returns
    (alphas, betas) stacked over rounds and the final block inverses."""
    L = jnp.swapaxes(B, -1, -2)
    R = _shift(B, 1)
    alphas, betas = [], []
    s = 1
    for _ in range(steps):
        dinv = _inv3(D)
        a = _mm(L, _shift(dinv, -s))
        b = _mm(R, _shift(dinv, s))
        D = D - _mm(a, _shift(R, -s)) - _mm(b, _shift(L, s))
        Ln = -_mm(a, _shift(L, -s))
        Rn = -_mm(b, _shift(R, s))
        alphas.append(a)
        betas.append(b)
        L, R = Ln, Rn
        s *= 2
    n = D.shape[0]
    z = jnp.zeros((0, n, 3, 3), D.dtype)
    al = jnp.stack(alphas) if alphas else z
    be = jnp.stack(betas) if betas else z
    return al, be, _inv3(D)


def _pcr_apply(alphas, betas, dinv, r):
    """x = T^{-1} r given PCR coefficients. r: (S, 3, ...) -> same."""
    steps = alphas.shape[0]
    s = 1
    mv = _mv3

    for k in range(steps):
        r = r - mv(alphas[k], _shift(r, -s)) - mv(betas[k], _shift(r, s))
        s *= 2
    return mv(dinv, r)


def _dense_tail_factor(plan: TreePlan, D_tail, dacc_tail, k_pad, fill_B):
    """Dense inverse of the tail levels' junction-Schur system.

    After the PCR levels eliminated slots [0, t0), the remaining system on
    the tail slots is: their (BC'd, reg'd) tree diagonal + the Schur diag
    corrections accumulated by PCR paths (``dacc_tail``) + tree-element
    couplings between tail slots (static ``dense_*`` tables) + fill
    couplings produced by PCR paths whose BOTH junctions are tail slots.
    SPD by construction, <= tree_dense_tail blocks — one inverse per
    factorization, one MXU matvec per apply."""
    meta = plan.meta
    S_tot = plan.n_slots
    t0 = meta.level_offsets[n_pcr_levels(meta)]
    Sd = S_tot - t0
    dtype = D_tail.dtype
    M = jnp.zeros((Sd, Sd, 3, 3), dtype)
    ar = jnp.arange(Sd)
    M = M.at[ar, ar].add(D_tail + dacc_tail)
    ke = k_pad[plan.dense_eid]
    M = M.at[plan.dense_i, plan.dense_j].add(ke)
    M = M.at[plan.dense_j, plan.dense_i].add(jnp.swapaxes(ke, -1, -2))
    p_pcr = meta.path_offsets[n_pcr_levels(meta)]
    if p_pcr:
        tgt = plan.att_tgt[:p_pcr]
        both = (plan.has_fill[:p_pcr]
                & (tgt[:, 0] >= t0) & (tgt[:, 0] < S_tot)
                & (tgt[:, 1] >= t0) & (tgt[:, 1] < S_tot))
        fb = fill_B[:p_pcr] * both[:, None, None]
        ti = jnp.clip(tgt[:, 0] - t0, 0, Sd - 1)
        tj = jnp.clip(tgt[:, 1] - t0, 0, Sd - 1)
        M = M.at[ti, tj].add(fb)
        M = M.at[tj, ti].add(jnp.swapaxes(fb, -1, -2))
    Md = jnp.transpose(M, (0, 2, 1, 3)).reshape(3 * Sd, 3 * Sd)
    if Md.dtype == jnp.float64 and jax.default_backend() != "cpu":
        # TPU LuDecomposition is f32-only; an f32 inverse is fine for a
        # preconditioner factor (CG corrects the PC's rounding).
        return jnp.linalg.inv(Md.astype(jnp.float32)).astype(Md.dtype)
    return jnp.linalg.inv(Md)


def _dense_tail_apply(factor: TreeFactor, r_tail):
    """u_tail = Sinv · r_tail, (Sd, 3) -> (Sd, 3)."""
    u = jnp.einsum("ij,j->i", factor.sinv, r_tail.reshape(-1),
                   precision=HI)
    return u.reshape(r_tail.shape)


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class FastMeta:
    """Static flags of the fast factorization (hashable jit-cache key)."""
    level_left_fill: tuple    # per level: has KIND_FILL left edges


class FastFactorData(NamedTuple):
    """Static (per-mesh) tables for the gather-free factorization under the
    UNIFIED chain==slot ordering (model._unified_order).

    f32 per-row gathers/scatters at 1e5 rows cost 30-90 ms each on TPU —
    they dominated tree_factor's cold cost (measured ~750 ms at 309k DOF).
    With chain position s == slot s, the diagonal assembles from chain
    SHIFTS plus a tiny jump scatter, the left-edge couplings come from a
    static table masked by bool gathers, and slot extraction is a slice.
    """
    chain_tree: jnp.ndarray   # (N,) bool — chain slot's element in forest
    jump_tree: jnp.ndarray    # (Jp,) bool
    left_k3: jnp.ndarray      # (S,3,3) static left-edge element k3
                              # (zero for KIND_FILL / KIND_NONE rows)
    ja: jnp.ndarray           # (Jp,) int32 jump endpoint chain positions
    jb: jnp.ndarray           # (Jp,) int32 (sentinel N for padding rows)
    meta: FastMeta            # static flags


def chain_tree_diag(plan: TreePlan, fast: FastFactorData, cplan,
                    active: jnp.ndarray, free_chain: jnp.ndarray,
                    reg) -> jnp.ndarray:
    """(N,3,3) tree-PC diagonal in CHAIN order, scatter/gather-free up to
    bool gathers and a 2J-row jump scatter. Rows >= n_slots (grips) and
    anchored-pinned rows are identity."""
    dtype = plan.k3.dtype
    N = free_chain.shape[0]
    eye = jnp.eye(3, dtype=dtype)
    act_pad = jnp.concatenate([active.astype(bool),
                               jnp.zeros((1,), bool)])
    m_c = (act_pad[cplan.chain_elem] & fast.chain_tree)
    n = cplan.chain_n
    nnT = n[:, :, None] * n[:, None, :]
    # (kax-kbd) n n^T + kbd I — the same association as tree.element_k3
    # so the fast factor tracks the generic one to fp roundoff
    k3c = (nnT * (cplan.chain_kax - cplan.chain_kbd)[:, None, None]
           + cplan.chain_kbd[:, None, None] * eye[None])
    k3c = k3c * m_c[:, None, None]
    # chain edge i connects positions i and i+1: both ends get its k3
    D = k3c + jnp.concatenate([jnp.zeros((1, 3, 3), dtype), k3c[:-1]])
    # jump edges (few thousand rows — the only scatter left)
    m_j = (act_pad[cplan.jump_elem] & fast.jump_tree)
    nj = cplan.jump_n
    nnTj = nj[:, :, None] * nj[:, None, :]
    k3j = (nnTj * (cplan.jump_kax - cplan.jump_kbd)[:, None, None]
           + cplan.jump_kbd[:, None, None] * eye[None])
    k3j = k3j * m_j[:, None, None]
    D = D.at[fast.ja].add(k3j, mode="drop")
    D = D.at[fast.jb].add(k3j, mode="drop")
    D = D + reg * eye[None]
    return jnp.where(free_chain[:, None, None], D, eye[None])


def tree_factor_fast(plan: TreePlan, fast: FastFactorData, cplan,
                     active: jnp.ndarray, free_now: jnp.ndarray,
                     free_chain: jnp.ndarray, reg,
                     conn: jnp.ndarray) -> TreeFactor:
    """tree_factor without N/S-row f32 gathers or scatters (unified
    ordering only). Numerically identical to tree_factor — tested
    elementwise against it."""
    meta = plan.meta
    k3 = plan.k3
    S_tot = plan.n_slots
    P_tot = plan.n_paths
    dtype = k3.dtype
    eye = jnp.eye(3, dtype=dtype)

    D_g = chain_tree_diag(plan, fast, cplan, active, free_chain,
                          reg)[:S_tot]

    # left-edge element couplings: static k3 table * active * both-free
    act_pad = jnp.concatenate([active.astype(bool),
                               jnp.zeros((1,), bool)])
    la = act_pad[plan.left_elem]                         # (S,) bool
    fprev = jnp.concatenate([jnp.zeros((1,), bool), free_chain[:S_tot][:-1]])
    lmask = (la & free_chain[:S_tot] & fprev).astype(dtype)
    B_elem = -fast.left_k3 * lmask[:, None, None]        # (S,3,3)

    # attachment couplings stay on the (small) path axis
    m_couple = (active & plan.tree_edge
                & free_now[conn[:, 0]] & free_now[conn[:, 1]]
                & (conn[:, 0] != conn[:, 1]))
    k_pad = jnp.concatenate(
        [-k3 * m_couple[:, None, None], jnp.zeros((1, 3, 3), dtype)])

    fill_B = jnp.zeros((P_tot + 1, 3, 3), dtype)
    dacc = jnp.zeros((S_tot + 1, 3, 3), dtype)

    alphas, betas = [], []
    dinv_parts = []
    attb_parts = []
    L = n_pcr_levels(meta)
    for li in range(L):
        s0, s1 = meta.level_offsets[li], meta.level_offsets[li + 1]
        p0, p1 = meta.path_offsets[li], meta.path_offsets[li + 1]
        D_l = D_g[s0:s1] + dacc[s0:s1]
        B_l = B_elem[s0:s1]
        if fast.meta.level_left_fill[li]:
            lf = plan.left_fill[s0:s1]
            B_fill = fill_B[lf]
            B_fill = jnp.where(plan.left_fill_flip[s0:s1, None, None],
                               jnp.swapaxes(B_fill, -1, -2), B_fill)
            B_l = B_l + B_fill
        al, be, dinv = _pcr_coeffs(D_l, B_l, meta.level_steps[li])
        alphas.append(al)
        betas.append(be)
        dinv_parts.append(dinv)

        fg = plan.first_gpos[p0:p1] - s0
        lg = plan.last_gpos[p0:p1] - s0
        ab = k_pad[plan.att_elem[p0:p1]] \
            + fill_B[plan.att_fill[p0:p1]]
        ab = jnp.where(plan.att_flip[p0:p1, :, None, None],
                       jnp.swapaxes(ab, -1, -2), ab)
        attb_parts.append(ab)

        S_l = s1 - s0
        rhs = jnp.zeros((S_l, 3, 6), dtype)
        rhs = rhs.at[fg, :, 0:3].add(eye)
        rhs = rhs.at[lg, :, 3:6].add(eye)
        X = _pcr_apply(al, be, dinv, rhs)
        Mff = X[fg, :, 0:3]
        Mll = X[lg, :, 3:6]
        Mfl = X[fg, :, 3:6]
        bl, br = ab[:, 0], ab[:, 1]
        dg_l = -_mm(_mm(bl, Mff), jnp.swapaxes(bl, -1, -2))
        dg_r = -_mm(_mm(br, Mll), jnp.swapaxes(br, -1, -2))
        tgt = plan.att_tgt[p0:p1]
        dacc = dacc.at[tgt[:, 0]].add(dg_l)
        dacc = dacc.at[tgt[:, 1]].add(dg_r)
        fb = -_mm(_mm(bl, Mfl), jnp.swapaxes(br, -1, -2))
        fb = fb * plan.has_fill[p0:p1, None, None]
        fill_B = fill_B.at[jnp.arange(p0, p1)].set(fb)

    dinv_all = (jnp.concatenate(dinv_parts) if dinv_parts
                else jnp.zeros((0, 3, 3), dtype))
    attb_all = (jnp.concatenate(attb_parts) if attb_parts
                else jnp.zeros((0, 2, 3, 3), dtype))
    t0 = meta.level_offsets[L]
    sinv = (_dense_tail_factor(plan, D_g[t0:S_tot], dacc[t0:S_tot],
                               k_pad, fill_B)
            if S_tot > t0 else None)
    return TreeFactor(alphas=tuple(alphas), betas=tuple(betas),
                      dinv=dinv_all, att_b=attb_all, sinv=sinv)


def tree_apply_chain(plan: TreePlan, factor: TreeFactor,
                     r_chain: jnp.ndarray) -> jnp.ndarray:
    """tree_apply on CHAIN-ordered (N,3) residuals under the unified
    ordering: slots occupy positions [0, n_slots) so the per-iteration
    N-row gathers of the node-space version become slices."""
    meta = plan.meta
    L = n_pcr_levels(meta)
    S_tot = plan.n_slots
    t0 = meta.level_offsets[L]
    racc = jnp.concatenate(
        [r_chain[:S_tot], jnp.zeros((1, 3), r_chain.dtype)])
    mv, mtv = _mv3, _mtv3

    ys = []
    for li in range(L):
        s0, s1 = meta.level_offsets[li], meta.level_offsets[li + 1]
        p0, p1 = meta.path_offsets[li], meta.path_offsets[li + 1]
        y = _pcr_apply(factor.alphas[li], factor.betas[li],
                       factor.dinv[s0:s1], racc[s0:s1])
        ys.append(y)
        ab = factor.att_b[p0:p1]
        fg = plan.first_gpos[p0:p1] - s0
        lg = plan.last_gpos[p0:p1] - s0
        tgt = plan.att_tgt[p0:p1]
        racc = racc.at[tgt[:, 0]].add(-mv(ab[:, 0], y[fg]))
        racc = racc.at[tgt[:, 1]].add(-mv(ab[:, 1], y[lg]))

    u_all = jnp.zeros((S_tot + 1, 3), r_chain.dtype)
    if S_tot > t0:
        u_all = u_all.at[t0:S_tot].set(
            _dense_tail_apply(factor, racc[t0:S_tot]))
    for li in range(L - 1, -1, -1):
        s0, s1 = meta.level_offsets[li], meta.level_offsets[li + 1]
        p0, p1 = meta.path_offsets[li], meta.path_offsets[li + 1]
        ab = factor.att_b[p0:p1]
        fg = plan.first_gpos[p0:p1] - s0
        lg = plan.last_gpos[p0:p1] - s0
        tgt = plan.att_tgt[p0:p1]
        uj0 = u_all[tgt[:, 0]]
        uj1 = u_all[tgt[:, 1]]
        z = jnp.zeros((s1 - s0, 3), r_chain.dtype)
        z = z.at[fg].add(mtv(ab[:, 0], uj0))
        z = z.at[lg].add(mtv(ab[:, 1], uj1))
        u = ys[li] - _pcr_apply(factor.alphas[li], factor.betas[li],
                                factor.dinv[s0:s1], z)
        u_all = u_all.at[s0:s1].set(u)

    return jnp.concatenate([u_all[:S_tot], r_chain[S_tot:]], axis=0)


def tree_factor(plan: TreePlan, active: jnp.ndarray,
                free_now: jnp.ndarray, reg,
                conn: jnp.ndarray) -> TreeFactor:
    """Numeric factorization (jit-safe; called once per solve).

    active: (E,) bool; free_now: (N,) bool (grips AND anchored);
    conn: (E,2)."""
    meta = plan.meta
    k3 = plan.k3
    E = conn.shape[0]
    N = free_now.shape[0]
    S_tot = plan.n_slots
    P_tot = plan.n_paths
    dtype = k3.dtype

    m_tree = active & plan.tree_edge
    m_couple = (m_tree & free_now[conn[:, 0]] & free_now[conn[:, 1]]
                & (conn[:, 0] != conn[:, 1]))
    k_eff = k3 * m_tree[:, None, None]
    # diag: sum of incident active tree-edge couplings + reg, identity on
    # pinned rows
    D_nodes = jnp.zeros((N, 3, 3), dtype)
    D_nodes = D_nodes.at[conn[:, 0]].add(k_eff)
    D_nodes = D_nodes.at[conn[:, 1]].add(k_eff)
    eye = jnp.eye(3, dtype=dtype)
    D_nodes = D_nodes + reg * eye[None]
    D_nodes = jnp.where(free_now[:, None, None], D_nodes, eye[None])

    # couplings indexed by source, with sentinel rows appended
    k_pad = jnp.concatenate(
        [-k3 * m_couple[:, None, None], jnp.zeros((1, 3, 3), dtype)])

    D_g = D_nodes[plan.slots]                     # (S,3,3)
    fill_B = jnp.zeros((P_tot + 1, 3, 3), dtype)  # + sentinel row
    dacc = jnp.zeros((S_tot + 1, 3, 3), dtype)    # + sentinel row

    alphas, betas = [], []
    dinv_parts = []
    attb_parts = []
    L = n_pcr_levels(meta)
    for li in range(L):
        s0, s1 = meta.level_offsets[li], meta.level_offsets[li + 1]
        p0, p1 = meta.path_offsets[li], meta.path_offsets[li + 1]
        D_l = D_g[s0:s1] + dacc[s0:s1]
        lf = plan.left_fill[s0:s1]
        B_fill = fill_B[lf]
        B_fill = jnp.where(plan.left_fill_flip[s0:s1, None, None],
                           jnp.swapaxes(B_fill, -1, -2), B_fill)
        B_l = k_pad[plan.left_elem[s0:s1]] + B_fill
        al, be, dinv = _pcr_coeffs(D_l, B_l, meta.level_steps[li])
        alphas.append(al)
        betas.append(be)
        dinv_parts.append(dinv)

        # attachment couplings B[j, s]
        fg = plan.first_gpos[p0:p1] - s0
        lg = plan.last_gpos[p0:p1] - s0
        ab = k_pad[plan.att_elem[p0:p1]] \
            + fill_B[plan.att_fill[p0:p1]]
        ab = jnp.where(plan.att_flip[p0:p1, :, None, None],
                       jnp.swapaxes(ab, -1, -2), ab)       # (P,2,3,3)
        attb_parts.append(ab)

        # corner blocks of T^{-1}: one 6-column PCR solve (unit blocks at
        # every first slot -> cols 0:3, every last slot -> cols 3:6; paths
        # are decoupled so they don't interact)
        S_l = s1 - s0
        rhs = jnp.zeros((S_l, 3, 6), dtype)
        rhs = rhs.at[fg, :, 0:3].add(eye)
        rhs = rhs.at[lg, :, 3:6].add(eye)
        X = _pcr_apply(al, be, dinv, rhs)          # (S,3,6)
        Mff = X[fg, :, 0:3]
        Mlf = X[lg, :, 0:3]
        Mll = X[lg, :, 3:6]
        Mfl = X[fg, :, 3:6]
        # Schur corrections dG_j = -B[j,s] M_ss B[j,s]^T
        bl, br = ab[:, 0], ab[:, 1]
        dg_l = -_mm(_mm(bl, Mff), jnp.swapaxes(bl, -1, -2))
        dg_r = -_mm(_mm(br, Mll), jnp.swapaxes(br, -1, -2))
        tgt = plan.att_tgt[p0:p1]
        dacc = dacc.at[tgt[:, 0]].add(dg_l)
        dacc = dacc.at[tgt[:, 1]].add(dg_r)
        # fill edge B[jl, jr] = -B[jl,f] M_fl B[jr,l]^T
        fb = -_mm(_mm(bl, Mfl), jnp.swapaxes(br, -1, -2))
        fb = fb * plan.has_fill[p0:p1, None, None]
        fill_B = fill_B.at[jnp.arange(p0, p1)].set(fb)

    dinv_all = (jnp.concatenate(dinv_parts) if dinv_parts
                else jnp.zeros((0, 3, 3), dtype))
    attb_all = (jnp.concatenate(attb_parts) if attb_parts
                else jnp.zeros((0, 2, 3, 3), dtype))
    t0 = meta.level_offsets[L]
    sinv = (_dense_tail_factor(plan, D_g[t0:S_tot], dacc[t0:S_tot],
                               k_pad, fill_B)
            if S_tot > t0 else None)
    return TreeFactor(alphas=tuple(alphas), betas=tuple(betas),
                      dinv=dinv_all, att_b=attb_all, sinv=sinv)


def tree_apply(plan: TreePlan, factor: TreeFactor, r: jnp.ndarray
               ) -> jnp.ndarray:
    """z = K_tree^{-1} r for (N,3) r; pinned rows pass through."""
    meta = plan.meta
    L = n_pcr_levels(meta)
    S_tot = plan.n_slots
    t0 = meta.level_offsets[L]
    racc = jnp.concatenate(
        [r[plan.slots], jnp.zeros((1, 3), r.dtype)])     # + sentinel
    mv, mtv = _mv3, _mtv3

    ys = []
    for li in range(L):
        s0, s1 = meta.level_offsets[li], meta.level_offsets[li + 1]
        p0, p1 = meta.path_offsets[li], meta.path_offsets[li + 1]
        y = _pcr_apply(factor.alphas[li], factor.betas[li],
                       factor.dinv[s0:s1], racc[s0:s1])
        ys.append(y)
        ab = factor.att_b[p0:p1]
        fg = plan.first_gpos[p0:p1] - s0
        lg = plan.last_gpos[p0:p1] - s0
        tgt = plan.att_tgt[p0:p1]
        racc = racc.at[tgt[:, 0]].add(-mv(ab[:, 0], y[fg]))
        racc = racc.at[tgt[:, 1]].add(-mv(ab[:, 1], y[lg]))

    u_all = jnp.zeros((S_tot + 1, 3), r.dtype)
    if S_tot > t0:
        u_all = u_all.at[t0:S_tot].set(
            _dense_tail_apply(factor, racc[t0:S_tot]))
    for li in range(L - 1, -1, -1):
        s0, s1 = meta.level_offsets[li], meta.level_offsets[li + 1]
        p0, p1 = meta.path_offsets[li], meta.path_offsets[li + 1]
        ab = factor.att_b[p0:p1]
        fg = plan.first_gpos[p0:p1] - s0
        lg = plan.last_gpos[p0:p1] - s0
        tgt = plan.att_tgt[p0:p1]
        uj0 = u_all[tgt[:, 0]]
        uj1 = u_all[tgt[:, 1]]
        z = jnp.zeros((s1 - s0, 3), r.dtype)
        z = z.at[fg].add(mtv(ab[:, 0], uj0))
        z = z.at[lg].add(mtv(ab[:, 1], uj1))
        u = ys[li] - _pcr_apply(factor.alphas[li], factor.betas[li],
                                factor.dinv[s0:s1], z)
        u_all = u_all.at[s0:s1].set(u)

    return r.at[plan.slots].set(u_all[:S_tot])


# ---------------------------------------------------------------------------
# grip reachability accelerated by the tree hierarchy
# ---------------------------------------------------------------------------

def tree_anchored(plan: TreePlan, model, active: jnp.ndarray
                  ) -> jnp.ndarray:
    """Nodes reachable from a grip through active elements.

    The plain BFS (ramp.anchored_mask_device) needs O(graph diameter)
    sweeps (~300 on the archived mesh, ~35 ms/call on the axon TPU). Here
    each fixpoint iteration hops an arbitrary distance ALONG TREE PATHS in
    log2(max path length) doubling rounds — reachability crosses a whole
    hypha per iteration — plus one plain neighbor sweep that covers cycle
    edges and grip seeding. Convergence: a handful of iterations (bounded
    by the number of cycle-edge crossings a shortest anchoring path needs).
    """
    meta = plan.meta
    L = len(meta.level_steps)
    grip = jnp.logical_or(model.top_nodes, model.bot_nodes)
    n = grip.shape[0]
    conn = model.conn

    act_pad = jnp.concatenate([active, jnp.zeros((1,), bool)])
    link_ok = act_pad[model.incident]                     # (N, deg)
    # slot-space static pieces
    left_act = act_pad[plan.left_elem]                    # (S,) bool; fill
    # edges: a fill edge is traversable iff its underlying path span and
    # both attachments are — conservatively treat fills as INACTIVE here
    # (the plain neighbor sweep still propagates through those junctions'
    # real edges, so correctness is unaffected; only the hop length of a
    # single iteration shrinks)
    att_act = act_pad[plan.att_elem]                      # (P,2) bool
    tgt = plan.att_tgt                                    # (P,2)
    S_tot = plan.n_slots

    def body(c):
        anch, _ = c
        # 1. plain neighbor sweep (covers grip seeding + cycle edges)
        anch_pad = jnp.concatenate([anch, jnp.zeros((1,), bool)])
        nb = jnp.logical_and(anch_pad[model.neighbor], link_ok)
        anch1 = jnp.logical_or(anch, jnp.any(nb, axis=1))
        anch1 = jnp.logical_or(anch1, grip)
        # 2. tree sweep in slot space: within-path doubling + attachments
        sv = jnp.concatenate([anch1[plan.slots],
                              jnp.zeros((1,), bool)])     # (S+1,)
        for li in range(L):
            s0, s1 = meta.level_offsets[li], meta.level_offsets[li + 1]
            p0, p1 = meta.path_offsets[li], meta.path_offsets[li + 1]
            seg = sv[s0:s1]
            la = left_act[s0:s1]
            sv = sv.at[s0:s1].set(_span_or(seg, la,
                                           meta.level_steps[li]))
            # attachments: junction <-> path ends (both directions)
            fg = plan.first_gpos[p0:p1]
            lg = plan.last_gpos[p0:p1]
            aa = att_act[p0:p1]
            for side, ends in ((0, fg), (1, lg)):
                j_anch = jnp.logical_and(sv[tgt[p0:p1, side]], aa[:, side])
                sv = sv.at[ends].max(j_anch)
                e_anch = jnp.logical_and(sv[ends], aa[:, side])
                sv = sv.at[tgt[p0:p1, side]].max(e_anch)
            sv = sv.at[s0:s1].set(_span_or(sv[s0:s1], la,
                                           meta.level_steps[li]))
        anch2 = anch1.at[plan.slots].max(sv[:S_tot])
        return anch2, jnp.any(anch2 != anch)

    def cond(c):
        return c[1]

    anch, _ = jax.lax.while_loop(cond, body,
                                 (grip, jnp.asarray(True)))
    return anch


def _span_or(seg: jnp.ndarray, left_act: jnp.ndarray, steps: int
             ) -> jnp.ndarray:
    """OR-propagate boolean seg values along contiguous active spans of a
    concatenated-path array, in `steps` doubling rounds. left_act[i] marks
    the edge (i-1, i) active; propagation never crosses inactive edges or
    path boundaries (left_act is False there)."""
    # conn[i] at round with distance s: edges (i..i+s) all active,
    # i.e. left_act[i+1..i+s] all True
    conn = jnp.roll(left_act, -1)      # conn_1[i] = left_act[i+1]
    s = 1
    for _ in range(steps):
        seg = jnp.logical_or(seg,
                             jnp.logical_and(jnp.roll(seg, -s), conn))
        seg = jnp.logical_or(seg,
                             jnp.logical_and(jnp.roll(seg, s),
                                             jnp.roll(conn, s)))
        conn = jnp.logical_and(conn, jnp.roll(conn, -s))
        s *= 2
    return seg
