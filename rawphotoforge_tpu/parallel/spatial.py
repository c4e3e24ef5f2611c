"""Spatially-sharded stencil stages: demosaic + sharpen with halo exchange.

SURVEY.md §2.6/§5: the TPU analog of the reference's single-kernel
workgroup tiling for *multi-chip* scale is row-sharding one huge image
across the 'sp' mesh axis. Pointwise stages need no communication (XLA
partitions them); the stencil stages (demosaic: 2px support, sharpen: 2px)
need their neighbors' boundary rows. This module implements that with
shard_map + ppermute: each shard sends its top/bottom HALO rows to its
neighbors, pads locally, and runs the same shift-arithmetic demosaic as the
single-device path — bit-identical output (tested shard-vs-single).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from ._compat import shard_map

from ..ops import demosaic as dm
from ..ops.sharpen import unsharp_mask

HALO = 2  # rows of support needed by the 5x5 demosaic / radius-2 blur


def _exchange_rows(local: jax.Array, axis: str) -> jax.Array:
    """Return ``local`` padded with HALO rows from each neighbor shard.

    Edge shards mirror their own boundary (reflect), matching the
    single-device jnp.pad(..., 'reflect') semantics. ``local`` is the
    shard's [h_local, W] block; rows must be contiguous along axis 0.
    """
    idx = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)

    # ppermute: send my top rows to my upper neighbor (they become its
    # bottom halo) and my bottom rows to my lower neighbor.
    top_rows = local[:HALO]        # go to neighbor idx-1 as its bottom halo
    bot_rows = local[-HALO:]       # go to neighbor idx+1 as its top halo
    from_below = jax.lax.ppermute(
        top_rows, axis, [(i, i - 1) for i in range(1, n)]
    )
    from_above = jax.lax.ppermute(
        bot_rows, axis, [(i, i + 1) for i in range(n - 1)]
    )
    # Edge shards: reflect own boundary (rows 1..HALO and -HALO-1..-1
    # mirrored, matching np.pad reflect which excludes the edge row).
    reflect_top = local[1 : HALO + 1][::-1]
    reflect_bot = local[-HALO - 1 : -1][::-1]
    top_halo = jnp.where(idx == 0, reflect_top, from_above)
    bot_halo = jnp.where(idx == n - 1, reflect_bot, from_below)
    return jnp.concatenate([top_halo, local, bot_halo], axis=0)


def demosaic_sharded(
    mosaic: jax.Array, mesh: Mesh, pattern: str = "RGGB", method: str = "malvar"
) -> jax.Array:
    """Row-sharded Bayer demosaic over the 'sp' mesh axis.

    The mosaic [H, W] is sharded over rows; each shard exchanges HALO
    boundary rows with its neighbors over ICI, then demosaics its
    (haloed) block locally and drops the halo. Shard heights must be even
    (CFA phase) and H divisible by the axis size.

    Returns planar RGB [3, H, W] with the same sharding as the input rows.
    """
    n_sp = mesh.shape["sp"]
    h, w = mosaic.shape
    if n_sp > 1 and h % (2 * n_sp) != 0:
        # Shards must start on even global rows (CFA phase) and split
        # evenly. A single shard starts at row 0 whatever the parity —
        # odd heights (common after vendor border crops) stay valid
        # there, like the unsharded demosaic.
        raise ValueError(
            f"height {h} must be divisible by 2 * sp axis size ({2 * n_sp})"
        )
    if h // n_sp <= HALO:
        # The edge-shard reflection needs HALO rows beyond the boundary
        # row from the SAME shard; with h_local == HALO the slice
        # silently broadcasts a single row into both halo rows.
        raise ValueError(
            f"shard height {h // n_sp} must exceed the halo ({HALO}); "
            f"use fewer 'sp' shards for a {h}-row image"
        )

    demosaic = dm.demosaic_malvar if method == "malvar" else dm.demosaic_bilinear

    def local_fn(block):
        block = block[0]  # drop the leading singleton of the P spec
        haloed = _exchange_rows(block, "sp")
        rgb = demosaic(haloed, pattern)  # local phase == global (see note)
        return rgb[None, :, HALO:-HALO, :]

    # Note on CFA phase: shards start at even global rows (h_local is
    # even), and the halo shifts the local origin by HALO (= 2, even), so
    # the local phase masks equal the global ones.
    out = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=P(None, "sp", None),
        out_specs=P(None, None, "sp", None),
        check_vma=False,
    )(mosaic[None])
    return out[0]


def distortion_sharded(
    planes: jax.Array,
    distortion,
    mesh: Mesh,
    max_abs_distortion: float = 100.0,
    extent=None,
) -> jax.Array:
    """Row-sharded lens-distortion warp with bounded-displacement halo
    exchange (SURVEY §7.3: the one stage that genuinely needs cross-shard
    reads).

    The warp's maximum vertical reach over the slider range is a static
    bound (ops.geometry.max_row_displacement); each shard collects just
    enough neighbor rows to cover it — K ppermute hops, the outermost hop
    trimmed to the residual halo — then computes its own destination rows
    only. No full-image replicated compute. Same ops.geometry.warp_coords
    math and global clamp as the single-device warp; note the two
    differently-compiled programs differ at ulp level in the source
    coordinates, which ty = py - floor(py) can amplify — comparisons need
    height-scaled tolerances (CLAUDE.md), not bit equality.

    ``planes`` [3, H, W] row-sharded over 'sp'; ``distortion`` the traced
    slider scalar; ``max_abs_distortion`` the static slider bound used for
    the halo analysis (smaller known ranges shrink communication);
    ``extent`` the true (h, w) f32 [2] for bucket-padded buffers — the
    warp normalizes and clamps by it, like the single-device path.
    """
    from ..ops.geometry import (max_row_displacement, snap_near_integer,
                                warp_coords)

    n_sp = mesh.shape["sp"]
    _, h, w = planes.shape
    if n_sp == 1:
        from ..ops.develop import geometry_stage

        return geometry_stage(planes, distortion, extent)
    # Heights that don't divide the mesh pad with edge rows to a shard
    # multiple: the warp normalizes and clamps by the TRUE height, so the
    # padded rows are never sampled, and they are sliced off afterwards.
    pad = (-h) % n_sp
    if pad:
        planes = jnp.concatenate(
            [planes, jnp.repeat(planes[:, -1:], pad, axis=1)], axis=1)
    h_pad = h + pad
    h_local = h_pad // n_sp
    halo = max_row_displacement(h, w, max_abs_distortion)
    if halo is None:
        halo = (n_sp - 1) * h_local  # singular model range: gather all
    halo = min(halo, (n_sp - 1) * h_local)
    k = -(-halo // h_local)  # hops needed
    # Rows contributed by hop j (outermost hop trimmed to the residual).
    m = [min(h_local, halo - (j - 1) * h_local) for j in range(1, k + 1)]
    h_above = sum(m)
    strength = -0.5 * (jnp.asarray(distortion, dtype=jnp.float32) / 100.0)
    if extent is None:
        ext_arr = jnp.asarray([jnp.float32(h), jnp.float32(w)])
    else:
        ext_arr = jnp.where(
            jnp.asarray(extent, jnp.float32) > 0,
            jnp.asarray(extent, jnp.float32),
            jnp.asarray([h, w], jnp.float32),
        )

    def local_fn(block, s, ext_hw):
        rows = block[0].transpose(1, 0, 2)  # [h_local, 3, W]
        above = []
        below = []
        for j in range(k, 0, -1):
            # My bottom m[j-1] rows go to shard idx+j (their hop-j top
            # halo); my top rows go to idx-j.
            above.append(jax.lax.ppermute(
                rows[-m[j - 1]:], "sp",
                [(i, i + j) for i in range(n_sp - j)],
            ))
        for j in range(1, k + 1):
            below.append(jax.lax.ppermute(
                rows[: m[j - 1]], "sp",
                [(i, i - j) for i in range(j, n_sp)],
            ))
        ext = jnp.concatenate(above + [rows] + below, axis=0)
        # ext[0] holds global row idx*h_local - h_above (leading rows of
        # edge shards are zero-filled but the global clamp keeps every
        # gathered index inside the real data).
        idx = jax.lax.axis_index("sp")
        base = idx * h_local - h_above
        # Normalize and clamp by the TRUE extent (bucket-padded buffers),
        # exactly like the single-device geometry stage.
        hf = ext_hw[0]
        wf = ext_hw[1]
        ys = (jax.lax.broadcasted_iota(jnp.int32, (h_local, w), 0)
              + idx * h_local)
        xs = jax.lax.broadcasted_iota(jnp.int32, (h_local, w), 1)
        py, px, oob = warp_coords(ys, xs, hf, wf, s[0])
        # Same near-integer snap as the single-device warp — BOTH paths
        # must take it or sharded-vs-single ulp divergence widens to
        # full pixels at snapped coordinates (geometry.snap_near_integer).
        px, py = jax.lax.optimization_barrier(
            (snap_near_integer(px), snap_near_integer(py)))
        wi = (wf - 1.0).astype(jnp.int32)
        hi = (hf - 1.0).astype(jnp.int32)
        x0f = jnp.floor(px)
        y0f = jnp.floor(py)
        x0 = jnp.clip(x0f.astype(jnp.int32), 0, wi)
        y0 = jnp.clip(y0f.astype(jnp.int32), 0, hi)
        x1 = jnp.minimum(x0 + 1, wi)
        y1 = jnp.minimum(y0 + 1, hi)
        tx = px - x0f
        ty = py - y0f
        y0l = y0 - base
        y1l = y1 - base
        planes_ext = ext.transpose(1, 0, 2)  # [3, h_ext, W]
        out = jnp.stack([
            jnp.where(
                oob, 0.0,
                (planes_ext[c][y0l, x0] * (1.0 - tx)
                 + planes_ext[c][y0l, x1] * tx) * (1.0 - ty)
                + (planes_ext[c][y1l, x0] * (1.0 - tx)
                   + planes_ext[c][y1l, x1] * tx) * ty,
            )
            for c in range(3)
        ])
        return out[None]

    def run_warp(p):
        return shard_map(
            local_fn,
            mesh=mesh,
            in_specs=(P(None, None, "sp", None), P(), P()),
            out_specs=P(None, None, "sp", None),
            check_vma=False,
        )(p[None], strength[None], ext_arr)[0]

    # Zero strength is an exact identity (wgsl:118-120 early return) AND
    # skips the halo collectives + gather at runtime — the common
    # interactive case where the distortion slider sits at 0.
    out = jax.lax.cond(strength == 0.0, lambda p: p, run_warp, planes)
    return out[:, :h, :] if pad else out


def raw_develop_sharded(
    mosaic01: jax.Array,
    wb_gains: jax.Array,
    cam2srgb: jax.Array,
    mesh: Mesh,
    pattern: str = "RGGB",
    sharpen_amount=None,
) -> jax.Array:
    """Sharded RAW front end: CFA WB -> halo-exchange demosaic -> camera
    matrix (-> sharpen). Everything except the two halo exchanges is
    communication-free."""
    balanced = dm.apply_wb_mosaic(mosaic01, pattern, wb_gains)
    balanced = jax.lax.with_sharding_constraint(
        balanced, NamedSharding(mesh, P("sp", None))
    )
    rgb = demosaic_sharded(balanced, mesh, pattern=pattern)
    rgb = dm.camera_to_srgb(rgb, cam2srgb)
    rgb = jnp.clip(rgb, 0.0, 1.0)
    if sharpen_amount is not None:
        amt = jnp.asarray(sharpen_amount, dtype=jnp.float32)

        def sharp_local(block):  # [3, h_local, W]
            rows_first = block.transpose(1, 0, 2)          # [h, 3, W]
            haloed = _exchange_rows(rows_first, "sp")      # [h+2H, 3, W]
            sharpened = unsharp_mask(haloed.transpose(1, 0, 2), amt)
            return sharpened[:, HALO:-HALO, :]

        rgb = shard_map(
            sharp_local,
            mesh=mesh,
            in_specs=P(None, "sp", None),
            out_specs=P(None, "sp", None),
            check_vma=False,
        )(rgb)
    return jax.lax.with_sharding_constraint(
        rgb, NamedSharding(mesh, P(None, "sp", None))
    )
