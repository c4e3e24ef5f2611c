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

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

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
    if h % (2 * n_sp) != 0:
        raise ValueError(
            f"height {h} must be divisible by 2 * sp axis size ({2 * n_sp})"
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
        check_rep=False,
    )(mosaic[None])
    return out[0]


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
            check_rep=False,
        )(rgb)
    return jax.lax.with_sharding_constraint(
        rgb, NamedSharding(mesh, P(None, "sp", None))
    )
