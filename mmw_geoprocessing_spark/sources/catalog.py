"""External partitioned raster-layer catalog: the production source.

The synthetic fixtures (``sources.fixtures``) derive pixel tables in
session; a real deployment reads them from an on-disk/object-store
catalog. This module is that reader/writer — the Spark-native
counterpart of the reference's S3 GeoTrellis layer store
(``S3CollectionLayerReader`` at Utils.scala:22-23) and its spatial
pushdown (``.where(Intersects(shape))``, Utils.scala:241-248).

Layout (hive-partitioned parquet):

    root/layer=<layer_id>/key_col=<c>/key_row=<r>/part-*.parquet

One directory per tile ``SpatialKey`` per layer; file rows carry
``(cell_col, cell_row, value)``. The partition columns ARE the spatial
key, so an AOI's bounding box becomes min/max predicates on partition
columns and Catalyst prunes whole tile directories at planning time
(visible as ``PartitionFilters`` in the scan node) — the exact analogue
of the reference fetching only Intersects-ing 512x512 tiles.

100 TB design notes:
- Partition pruning removes the IO, but *partition discovery* still
  lists the directory tree. ``read_layer`` therefore prunes the
  ``layer=`` and ``key_col=`` levels driver-side (cheap single-level
  listings) and hands Spark only the in-range ``key_col`` subtrees with
  ``basePath`` set, so a continent-wide catalog never gets a full
  recursive listing for a watershed-sized query; ``key_row`` pruning
  stays declarative via PartitionFilters. A metastore-registered
  external table (partition metadata in the catalog) is the next step
  at real scale and composes with this reader unchanged.
- Tile-interior pixels stay long-form ``(cell_col, cell_row, value)``:
  parquet RLE/dictionary encodes the two cell coordinates to almost
  nothing, the vectorized reader keeps the scan JVM-side, and the pixel
  schema matches ``operators.zonal`` with zero reshaping.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.geometry import GridLayout, bbox

PIXEL_KEY = ["key_col", "key_row", "cell_col", "cell_row"]
PIXEL_COLS = [*PIXEL_KEY, "value"]


def write_layer(
    pixels: DataFrame,
    root: str,
    layer_id: str,
    layout: GridLayout | None = None,
    zoom: int | None = None,
) -> None:
    """Materialize one pixel table into the catalog layout.

    ``pixels``: ``(key_col, key_row, cell_col, cell_row, value)``.
    Rows are repartitioned by tile key before the write so each tile
    directory receives one file from one task (no small-file spray when
    the input partitioning doesn't align with the key grid).

    ``layout``/``zoom``: optional grid metadata persisted as a
    ``_layout.json`` sidecar in the layer directory — the catalog
    equivalent of the reference deriving ``TileLayerMetadata`` from the
    stored layer (Geoprocessing.scala:219-221); readers recover it with
    :func:`read_layer_layout` / :func:`register_zoom_layouts`. The
    sidecar also records the layer's value type so empty pruned reads
    stay schema-identical to non-empty ones.

    Idempotent re-ingest: the write uses DYNAMIC partition overwrite —
    only the ``(layer, key_col, key_row)`` partitions present in
    ``pixels`` are replaced, other layers in the same root are
    untouched, and re-running an ingest replaces the layer's tiles
    instead of silently appending duplicate pixel rows (which would
    corrupt every downstream count/average).
    """
    value_type = pixels.schema["value"].dataType.simpleString()
    (
        pixels.select(PIXEL_COLS)
        .withColumn("layer", F.lit(layer_id))
        .repartition("key_col", "key_row")
        .write.partitionBy("layer", "key_col", "key_row")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(root)
    )
    import json

    meta: dict = {"value_type": value_type}
    if layout is not None:
        meta.update(
            tile_size=layout.tile_size,
            origin_x=layout.origin_x,
            origin_y=layout.origin_y,
            cellsize=layout.cellsize,
        )
        if zoom is not None:
            meta["zoom"] = zoom
    layer_dir = os.path.join(root, f"layer={layer_id}")
    os.makedirs(layer_dir, exist_ok=True)
    with open(os.path.join(layer_dir, "_layout.json"), "w") as f:
        json.dump(meta, f)


def read_layer_layout(root: str, layer_id: str) -> tuple[GridLayout, int | None]:
    """Recover the grid frame a layer was written with (the reference
    derives the grid FROM the layer, never from the request alone)."""
    import json

    with open(os.path.join(root, f"layer={layer_id}", "_layout.json")) as f:
        meta = json.load(f)
    if "tile_size" not in meta:
        raise ValueError(f"layer {layer_id!r} sidecar has no grid metadata")
    layout = GridLayout(
        tile_size=int(meta["tile_size"]),
        origin_x=float(meta["origin_x"]),
        origin_y=float(meta["origin_y"]),
        cellsize=float(meta["cellsize"]),
    )
    return layout, meta.get("zoom")


def read_layer_value_type(root: str, layer_id: str) -> str | None:
    """The layer's ``value`` column type as recorded at write time
    (``_layout.json`` sidecar), or None when unknowable."""
    import json

    try:
        with open(os.path.join(root, f"layer={layer_id}", "_layout.json")) as f:
            return json.load(f).get("value_type")
    except (OSError, ValueError):
        return None


def register_zoom_layouts(root: str, layer_ids: list[str]) -> dict[int, GridLayout]:
    """Extend ``geometry.ZOOM_LAYOUTS`` from catalog layer metadata so
    requests at those zooms resolve to the layers' own grids (the
    production path for the zoom ladder). Conflicting registrations for
    one zoom raise rather than silently overwrite."""
    from mmw_geoprocessing_spark import geometry

    added: dict[int, GridLayout] = {}
    for lid in layer_ids:
        layout, zoom = read_layer_layout(root, lid)
        if zoom is None:
            continue
        existing = geometry.ZOOM_LAYOUTS.get(zoom, added.get(zoom))
        if existing is not None and existing != layout:
            raise ValueError(
                f"layer {lid!r} declares zoom {zoom} with layout {layout}, "
                f"but that zoom is already registered as {existing}"
            )
        geometry.ZOOM_LAYOUTS[zoom] = layout
        added[zoom] = layout
    return added


def key_bounds_for_polys(
    polys, layout: GridLayout | None = None
) -> tuple[int, int, int, int]:
    """AOI polygons -> inclusive tile-key bounds ``(kc0, kc1, kr0, kr1)``.

    The driver-side derivation of the reference's ``Intersects(aoi)``
    tile filter: the polygon bbox in grid units, floored to tile keys.
    """
    import math

    layout = layout or GridLayout()
    T = layout.tile_size
    rings = [[layout.to_grid(x, y) for x, y in ring] for poly in polys for ring in poly]
    x0, y0, x1, y1 = bbox([rings])
    return (
        int(math.floor(x0 / T)),
        int(math.floor(x1 / T)),
        int(math.floor(y0 / T)),
        int(math.floor(y1 / T)),
    )


def _pruned_layer_paths(
    root: str, layer_id: str, key_bounds: tuple[int, int, int, int] | None
) -> list[str]:
    """Driver-side partition-discovery pruning: list ONLY the ``layer=``
    level (and, with bounds, its ``key_col=`` children in range).
    Returns the sub-directory paths Spark should discover under; empty
    list means the layer has no in-range key_col directory."""
    layer_dir = os.path.join(root, f"layer={layer_id}")
    if key_bounds is None:
        return [layer_dir]
    kc0, kc1, _, _ = key_bounds
    out = []
    try:
        entries = os.listdir(layer_dir)
    except OSError:
        # non-local filesystem (s3a/hdfs URI) — fall back to declarative
        # pruning only; Catalyst still PartitionFilters everything.
        return [layer_dir]
    for e in entries:
        if e.startswith("key_col="):
            try:
                kc = int(e.split("=", 1)[1])
            except ValueError:
                continue
            if kc0 <= kc <= kc1:
                out.append(os.path.join(layer_dir, e))
    return sorted(out)


def read_layer(
    spark: SparkSession,
    root: str,
    layer_id: str,
    key_bounds: tuple[int, int, int, int] | None = None,
    value_type: str | None = None,
) -> DataFrame:
    """Read one layer from the catalog as a zonal-compatible pixel table.

    ``key_bounds``: inclusive ``(kc0, kc1, kr0, kr1)`` tile-key window
    (from ``key_bounds_for_polys``). When given, the window is applied
    as partition-column predicates — Catalyst shows them under
    ``PartitionFilters`` and never reads out-of-range tile directories —
    and the ``key_col`` level is additionally pruned driver-side before
    discovery (see module notes).

    ``value_type``: the layer's ``value`` column type, used only on the
    fully-pruned-empty path so an empty read is schema-identical to a
    non-empty one (a DOUBLE layer like slope must not come back INT and
    break downstream unions). Default: the write-time type recorded in
    the ``_layout.json`` sidecar, falling back to INT.

    Output: ``(key_col, key_row, cell_col, cell_row, value)``.
    """
    paths = _pruned_layer_paths(root, layer_id, key_bounds)
    if not paths:
        vt = value_type or read_layer_value_type(root, layer_id) or "int"
        return spark.range(0).selectExpr(
            *(f"CAST(NULL AS INT) AS {c}" for c in PIXEL_KEY),
            f"CAST(NULL AS {vt}) AS value",
        )
    df = spark.read.option("basePath", root).parquet(*paths)
    df = df.where(F.col("layer") == layer_id)
    if key_bounds is not None:
        kc0, kc1, kr0, kr1 = key_bounds
        df = df.where(
            (F.col("key_col") >= kc0)
            & (F.col("key_col") <= kc1)
            & (F.col("key_row") >= kr0)
            & (F.col("key_row") <= kr1)
        )
    casts = [F.col(c).cast("int").alias(c) for c in PIXEL_KEY]
    return df.select(*casts, "value")


def read_layers_for_aoi(
    spark: SparkSession,
    root: str,
    layer_ids: list[str],
    polys,
    layout: GridLayout | None = None,
) -> list[DataFrame]:
    """The reference's ``cropRastersToAOI`` (Utils.scala:34-41): one
    bbox-pruned scan per requested layer, ready for ``zonal.join_layers``.
    Duplicate ids are read once (U3, Geoprocessing.scala:28-29)."""
    key_bounds = key_bounds_for_polys(polys, layout) if polys else None
    seen: dict[str, DataFrame] = {}
    for lid in layer_ids:
        if lid not in seen:
            seen[lid] = read_layer(spark, root, lid, key_bounds)
    return [seen[lid] for lid in layer_ids]
