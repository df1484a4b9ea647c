"""Fused residual-add + LayerNorm Pallas kernels (fwd + custom-VJP bwd).

Replaces the XLA lowering of the transformer's ``LayerNorm(x + residual)``
epilogue (reference: oscar/modeling_bert.py BertSelfOutput/BertOutput —
``LayerNorm(hidden + input_tensor)``; repo call sites models/bert.py
BertLayer / BertEmbedding / pretrain MLM transform).

Why a kernel at all: the round-4 device trace of the nav train step
(tools/profile_nav_step.py; VALIDATION.md "nav roofline closed") shows the
LayerNorm work lowered to bandwidth-bound fusion groups —
``%convert_reduce_fusion`` (fp32 stat reduces over bf16 activations,
~7 ms/step) plus the LN share of ``%multiply_reduce_fusion`` (dgamma/dbeta
grad reductions, part of ~11.6 ms/step).  XLA splits each LN forward into a
stats pass and an apply pass, and each backward into a param-grad reduce
pass and a dx pass — every pass re-reading the (B, S, H) activation from
HBM.  These kernels make each direction ONE pass:

  * forward: read x (+ residual), compute mean/var in fp32 VMEM registers,
    write ONLY the normalized output.  Nothing else is stored: the backward
    residuals are x and residual themselves (alive in HBM regardless), and
    h = x + residual plus mean/rstd are recomputed in backward in exact
    fp32 from them (VPU row-reduces on VMEM-resident data, ~free) — which
    also keeps bf16 gradient parity at ~1e-3 instead of the ~1e-1 a
    bf16-stored h would give.
  * backward: read dy + x (+ residual) once; produce dh (= dx = dresidual —
    the add's gradient fans out to both operands identically) AND the
    per-grid-block partial dgamma/dbeta in the same pass.  The
    (num_blocks, H) partials are summed by XLA outside the kernel (KBs,
    not MBs).

All math fp32 in-kernel regardless of the (bf16) storage dtype; variance is
``mean(h^2) - mean(h)^2`` clamped at 0, matching flax's
``use_fast_variance`` LayerNorm so the fused module is numerically
interchangeable with ``nn.LayerNorm(dtype=f32)`` + ``.astype(bf16)`` at
bf16 tolerance (tests/test_layernorm.py pins fwd and all four grads, with
and without residual, against the jnp twin).

Row blocking: the (B, S, H) activation is flattened to (R, H) rows; the
grid runs over row blocks (H always fully lane-resident: H % 128 == 0).
Like the attention kernels, the gate (``layernorm_supports``) falls back to
the jnp path off-TPU or at non-tiling shapes, and the kernels are
single-device: under a mesh (GSPMD cannot partition Mosaic custom calls)
the model keeps the plain flax LayerNorm path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def layernorm_reference(x, residual, gamma, beta, eps: float):
    """jnp twin (flax fast-variance semantics), fp32 math, x.dtype output."""
    h = x.astype(jnp.float32)
    if residual is not None:
        h = h + residual.astype(jnp.float32)
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(h * h, axis=-1, keepdims=True) - mu * mu, 0.0)
    y = (h - mu) * jax.lax.rsqrt(var + eps)
    return (y * gamma.astype(jnp.float32)
            + beta.astype(jnp.float32)).astype(x.dtype)


def _pick_block_rows(rows: int) -> int:
    for br in (256, 128, 64, 32, 16):
        if rows % br == 0:
            return br
    return 0


def layernorm_supports(rows: int, hidden: int) -> bool:
    """TPU + tiling gate: full rows in lanes, row blocks on sublane tiles."""
    return (jax.default_backend() == "tpu"
            and hidden % 128 == 0
            and hidden <= 4096
            and _pick_block_rows(rows) > 0)


# ---------------------------------------------------------------------------
# Kernels.  has_res is static: one variant fuses the residual add (and must
# therefore emit h = x + residual for backward); the other normalizes x
# directly (x itself is the backward residual — nothing extra to store).
# ---------------------------------------------------------------------------

def _norm_write(h, g_ref, b_ref, y_ref, eps):
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(h * h, axis=-1, keepdims=True) - mu * mu, 0.0)
    xhat = (h - mu) * jax.lax.rsqrt(var + eps)
    y = xhat * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _fwd_res_kernel(x_ref, res_ref, g_ref, b_ref, y_ref, *, eps):
    h = x_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
    _norm_write(h, g_ref, b_ref, y_ref, eps)


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, *, eps):
    _norm_write(x_ref[:].astype(jnp.float32), g_ref, b_ref, y_ref, eps)


def _bwd_core(dy_ref, h, g_ref, dh_ref, dg_ref, db_ref, eps):
    mu = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(h * h, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (h - mu) * rstd
    dy = dy_ref[:].astype(jnp.float32)
    g = dy * g_ref[:].astype(jnp.float32)
    s1 = jnp.mean(g, axis=-1, keepdims=True)
    s2 = jnp.mean(g * xhat, axis=-1, keepdims=True)
    dh_ref[:] = ((g - s1 - xhat * s2) * rstd).astype(dh_ref.dtype)
    # Partial param grads: the (8, H) output block satisfies the TPU
    # sublane-tiling minimum; the block sum is spread evenly over the 8
    # rows (/8 is exact in fp32) and re-summed outside the kernel.
    dg_ref[:] = jnp.broadcast_to(
        jnp.sum(dy * xhat, axis=0, keepdims=True) * 0.125, dg_ref.shape)
    db_ref[:] = jnp.broadcast_to(
        jnp.sum(dy, axis=0, keepdims=True) * 0.125, db_ref.shape)


def _bwd_res_kernel(dy_ref, x_ref, res_ref, g_ref, dh_ref, dg_ref, db_ref,
                    *, eps):
    h = x_ref[:].astype(jnp.float32) + res_ref[:].astype(jnp.float32)
    _bwd_core(dy_ref, h, g_ref, dh_ref, dg_ref, db_ref, eps)


def _bwd_kernel(dy_ref, x_ref, g_ref, dh_ref, dg_ref, db_ref, *, eps):
    _bwd_core(dy_ref, x_ref[:].astype(jnp.float32), g_ref, dh_ref, dg_ref,
              db_ref, eps)


def _call_fwd(x2, res2, g2, b2, eps: float, has_res: bool,
              interpret: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, hidden = x2.shape
    br = _pick_block_rows(rows)
    grid = (rows // br,)
    row_spec = pl.BlockSpec((br, hidden), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, hidden), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=10 * rows * hidden,
        bytes_accessed=(2 + 2 * has_res) * rows * hidden * x2.dtype.itemsize,
        transcendentals=rows)
    if has_res:
        return pl.pallas_call(
            functools.partial(_fwd_res_kernel, eps=eps),
            grid=grid,
            in_specs=[row_spec, row_spec, vec_spec, vec_spec],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct((rows, hidden), x2.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(x2, res2, g2, b2)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[row_spec, vec_spec, vec_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((rows, hidden), x2.dtype),
        cost_estimate=cost,
        interpret=interpret,
    )(x2, g2, b2)


def _call_bwd(dy2, x2, res2, g2, eps: float, interpret: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, hidden = dy2.shape
    br = _pick_block_rows(rows)
    grid = (rows // br,)
    has_res = res2 is not None
    row_spec = pl.BlockSpec((br, hidden), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, hidden), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    part_spec = pl.BlockSpec((8, hidden), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    kernel = functools.partial(
        _bwd_res_kernel if has_res else _bwd_kernel, eps=eps)
    operands = (dy2, x2, res2, g2) if has_res else (dy2, x2, g2)
    dh, dgp, dbp = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec] * (len(operands) - 1) + [vec_spec],
        out_specs=[row_spec, part_spec, part_spec],
        out_shape=[jax.ShapeDtypeStruct((rows, hidden), dy2.dtype),
                   jax.ShapeDtypeStruct((grid[0] * 8, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((grid[0] * 8, hidden), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=16 * rows * hidden,
            bytes_accessed=(2 + has_res) * rows * hidden * dy2.dtype.itemsize,
            transcendentals=rows),
        interpret=interpret,
    )(*operands)
    return dh, jnp.sum(dgp, axis=0), jnp.sum(dbp, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _fused_add_layernorm(x, residual, gamma, beta, eps, interpret):
    y, _ = _fused_add_ln_fwd(x, residual, gamma, beta, eps, interpret)
    return y


def _fused_add_ln_fwd(x, residual, gamma, beta, eps, interpret):
    shape = x.shape
    hidden = shape[-1]
    rows = 1
    for d in shape[:-1]:
        rows *= d
    has_res = residual is not None
    x2 = x.reshape(rows, hidden)
    res2 = residual.reshape(rows, hidden) if has_res else None
    g2 = gamma.astype(jnp.float32).reshape(1, hidden)
    b2 = beta.astype(jnp.float32).reshape(1, hidden)
    y2 = _call_fwd(x2, res2, g2, b2, float(eps), has_res, interpret)
    # Residuals are x/res THEMSELVES (no h written in forward; h is
    # recomputed exactly in fp32 from them in backward) + the fp32 gamma.
    # None for a missing residual survives as pytree structure.
    return y2.reshape(shape), (x2, res2, g2)


def _fused_add_ln_bwd(eps, interpret, resids, dy):
    x2, res2, g2 = resids
    hidden = dy.shape[-1]
    dy2 = dy.reshape(-1, hidden)
    dh2, dg, db = _call_bwd(dy2, x2, res2, g2, float(eps), interpret)
    dh = dh2.reshape(dy.shape)
    return (dh, dh if res2 is not None else None,
            dg.reshape(-1), db.reshape(-1))


_fused_add_layernorm.defvjp(_fused_add_ln_fwd, _fused_add_ln_bwd)


def fused_add_layernorm(x, residual, gamma, beta, eps: float = 1e-12,
                        interpret: bool = False):
    """``LayerNorm(x + residual)`` (residual may be None) in one Pallas pass
    each direction.  Caller is responsible for the :func:`layernorm_supports`
    gate; output dtype is ``x.dtype`` (the fp32->bf16 cast is fused).
    ``interpret`` runs the kernels in Pallas interpret mode (CPU tests)."""
    return _fused_add_layernorm(x, residual, gamma, beta, eps, interpret)


# ---------------------------------------------------------------------------
# Mesh twin: the same kernels under a device mesh via shard_map.
#
# GSPMD cannot partition Mosaic custom calls, but LayerNorm is row-
# independent: each device runs the ordinary kernel on its (B/dp, S/sp, H)
# shard.  gamma/beta are REPLICATED inputs, and shard_map transposition of
# replicated operands is exactly the footgun the attention wrappers never
# hit (their operands are all sharded) — so the mesh path carries its own
# custom_vjp OUTSIDE shard_map: the backward shard_map returns each shard's
# (1, H) dgamma/dbeta partial through an out_spec that stacks shards on the
# leading axis, and the (n_shards, H) stack is summed OUTSIDE the mesh
# region — no reliance on transpose-inserted psums, no manual collective.
# ---------------------------------------------------------------------------

def _mesh_row_axes(mesh):
    """(batch_axis_names, token_axis_names) actually present in the mesh."""
    names = getattr(mesh, "axis_names", ())
    baxes = tuple(a for a in ("dp",) if a in names)
    taxes = tuple(a for a in ("sp", "cp") if a in names)
    return baxes, taxes


def layernorm_supports_mesh(mesh, rows_shape, hidden: int) -> bool:
    """Gate: per-shard rows must tile (B and S divide their mesh axes).

    Excludes pipeline meshes: under (dp, pp) the transformer layers execute
    INSIDE the GPipe shard_map region (parallel/pipeline.py) and a nested
    shard_map is not supported; those configs keep the flax LN.  Requires a
    dp axis — every supported mesh in this framework shards batch over dp,
    and without it the stacked-partials out_spec would be ambiguous."""
    if mesh is None or jax.default_backend() != "tpu":
        return False
    names = getattr(mesh, "axis_names", ())
    if "pp" in names or "dp" not in names:
        return False
    if any(a not in ("dp", "tp", "sp", "cp") for a in names):
        return False
    if hidden % 128 != 0 or hidden > 4096:
        return False
    baxes, taxes = _mesh_row_axes(mesh)
    b, s = rows_shape
    bdiv = 1
    for a in baxes:
        bdiv *= mesh.shape[a]
    tdiv = 1
    for a in taxes:
        tdiv *= mesh.shape[a]
    if b % bdiv or s % tdiv:
        return False
    return _pick_block_rows((b // bdiv) * (s // tdiv)) > 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _fused_ln_mesh(x, residual, gamma, beta, eps, mesh, interpret):
    y, _ = _fused_ln_mesh_fwd(x, residual, gamma, beta, eps, mesh, interpret)
    return y


def _mesh_specs(mesh):
    from jax.sharding import PartitionSpec as P

    baxes, taxes = _mesh_row_axes(mesh)
    row = P(baxes if baxes else None, taxes if taxes else None, None)
    allax = tuple(baxes) + tuple(taxes)
    part = P(allax if allax else None, None)
    return row, part


def _fused_ln_mesh_fwd(x, residual, gamma, beta, eps, mesh, interpret):
    from jax.sharding import PartitionSpec as P

    has_res = residual is not None
    g2 = gamma.astype(jnp.float32).reshape(1, -1)
    b2 = beta.astype(jnp.float32).reshape(1, -1)
    row_spec, _ = _mesh_specs(mesh)
    hidden = x.shape[-1]

    def body(x, res, g2, b2):
        rows = x.shape[0] * x.shape[1]
        y2 = _call_fwd(x.reshape(rows, hidden),
                       res.reshape(rows, hidden) if has_res else None,
                       g2, b2, float(eps), has_res, interpret)
        return y2.reshape(x.shape)

    args = (x, residual if has_res else x, g2, b2)
    y = jax.shard_map(body, mesh=mesh,
                      in_specs=(row_spec, row_spec, P(), P()),
                      out_specs=row_spec, check_vma=False)(*args)
    return y, (x, residual, g2)


def _fused_ln_mesh_bwd(eps, mesh, interpret, resids, dy):
    from jax.sharding import PartitionSpec as P

    x, residual, g2 = resids
    has_res = residual is not None
    row_spec, part_spec = _mesh_specs(mesh)
    hidden = x.shape[-1]

    def body(dy, x, res, g2):
        rows = x.shape[0] * x.shape[1]
        dh2, dg, db = _call_bwd(dy.reshape(rows, hidden),
                                x.reshape(rows, hidden),
                                res.reshape(rows, hidden) if has_res else None,
                                g2, float(eps), interpret)
        return dh2.reshape(x.shape), dg[None], db[None]

    dh, dgp, dbp = jax.shard_map(
        body, mesh=mesh,
        in_specs=(row_spec, row_spec, row_spec, P()),
        out_specs=(row_spec, part_spec, part_spec),
        check_vma=False)(dy, x, residual if has_res else x, g2)
    dg = jnp.sum(dgp, axis=0)
    db = jnp.sum(dbp, axis=0)
    return (dh, dh if has_res else None, dg, db)


_fused_ln_mesh.defvjp(_fused_ln_mesh_fwd, _fused_ln_mesh_bwd)


def fused_add_layernorm_mesh(x, residual, gamma, beta, eps: float = 1e-12,
                             *, mesh, interpret: bool = False):
    """``LayerNorm(x + residual)`` on a device mesh: per-shard Pallas
    kernels via shard_map, replicated-param grads summed outside the mesh
    region (see module comment).  Gate with
    :func:`layernorm_supports_mesh`; output dtype is ``x.dtype``."""
    return _fused_ln_mesh(x, residual, gamma, beta, eps, mesh, interpret)
