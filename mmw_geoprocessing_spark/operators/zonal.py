"""Zonal-statistics operators — the reference's public query surface.

Every operator is one instance of the reference's single plan shape
(SURVEY.md §0): scan → N-way full-outer layer join on pixel key →
polygon-mask join → hash aggregate grouped by the value tuple.

Inputs are *pixel tables*: ``(key_col INT, key_row INT, cell_col INT,
cell_row INT, value INT|DOUBLE)`` — the long-form equivalent of the
reference's ``TileLayerCollection[SpatialKey]`` (package.scala:9). Masks
are ``(key_col, key_row, cell_col, cell_row)`` pixel sets, the output of
rasterizing an AOI polygon (Geoprocessing.scala:356).

Scale design (100 TB):
- Layer joins are equi-joins on 4 int columns; with layers stored
  partitioned/bucketed by ``(key_col, key_row)`` Catalyst plans them as
  co-partitioned sort-merge joins with no extra shuffle, and AOI bbox
  predicates prune partitions at the scan.
- Aggregation output is tiny (a few hundred value tuples), so partial
  (map-side) aggregation collapses nearly all rows before the single
  cheap shuffle; AQE coalesces the post-shuffle partitions.
- No driver-side loops: ``*_many`` and ``multi`` push the per-AOI /
  per-operation dimension into the grouping key instead of looping
  (one pass, reference needed a request per polygon: CHANGELOG.md:82-91).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.functions.nodata import NODATA_INT, list_key

PIXEL_KEY = ["key_col", "key_row", "cell_col", "cell_row"]


def join_layers(layers: Sequence[DataFrame]) -> DataFrame:
    """N-way full-outer join of pixel tables on the pixel key.

    Reference ``joinCollectionLayers`` (Utils.scala:221-232): the key set
    is the *union* of the per-layer key sets and a layer missing a pixel
    contributes NODATA — i.e. FULL OUTER + ``coalesce(value, NODATA)``.

    Returns columns ``key_col,key_row,cell_col,cell_row,v1..vN`` (vi INT,
    NODATA-filled).
    """
    # selectExpr strings: one parsed call per projection instead of
    # per-Column py4j round-trips (the N-way join is the hot shared
    # builder — mapshed constructs it 5x per fresh suite plan)
    out = layers[0].selectExpr(*PIXEL_KEY, "value AS v1")
    for i, layer in enumerate(layers[1:], start=2):
        out = out.join(
            layer.selectExpr(*PIXEL_KEY, f"value AS v{i}"),
            on=PIXEL_KEY,
            how="full",
        )
    fills = [f"coalesce(v{i}, {NODATA_INT}) AS v{i}" for i in range(1, len(layers) + 1)]
    return out.selectExpr(*PIXEL_KEY, *fills)


def _value_cols(n: int) -> list[F.Column]:
    return [F.col(f"v{i}") for i in range(1, n + 1)]


def raster_grouped_count(layers: Sequence[DataFrame], mask: DataFrame) -> DataFrame:
    """O1 RasterGroupedCount (Geoprocessing.scala:338-368): zonal histogram
    of the value tuple across N rasters, NODATA participating as a value.

    Output: ``(list_key STRING, cnt BIGINT)``.
    """
    vals = _value_cols(len(layers))
    # merge hint (optimization r14): the mask fixture is bucketed on
    # the pixel key, so the hinted join is a zero-exchange sort-merge;
    # the planner's broadcast pick pays a per-fresh-plan collect+build
    # of the mask (measured 0.95 s -> 0.64 s median at sf0.1 bucketed)
    return (
        join_layers(layers)
        .join(mask.select(*PIXEL_KEY).hint("merge"), on=PIXEL_KEY, how="inner")
        .groupBy(*vals)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(list_key(*vals).alias("list_key"), "cnt")
    )


def raster_grouped_count_many(layers: Sequence[DataFrame], mask_many: DataFrame) -> DataFrame:
    """O2 RasterGroupedCountMany (Geoprocessing.scala:114-126): O1 for each
    AOI in one pass — the AOI id joins the grouping key instead of looping
    per polygon.

    ``mask_many``: ``(aoi_id, key_col, key_row, cell_col, cell_row)``.
    Output: ``(aoi_id STRING, list_key STRING, cnt BIGINT)``.
    """
    vals = _value_cols(len(layers))
    # merge hint (optimization r14): the many-AOI mask is the UNION of
    # all AOIs (~1 M rows at sf0.1) — the planner's broadcast choice
    # collects+ships it per fresh plan (measured 2.66 s vs 1.40 s
    # median at sf0.1) and cannot exist at 100 TB; the mask fixture is
    # bucketed on the pixel key, so the merge join is zero-exchange.
    # The single-AOI operators keep the broadcast: one rasterized AOI
    # is bounded (the reference ships it to every executor the same
    # way) and measured a wash locally.
    return (
        join_layers(layers)
        .join(
            mask_many.select("aoi_id", *PIXEL_KEY).hint("merge"),
            on=PIXEL_KEY,
            how="inner",
        )
        .groupBy(F.col("aoi_id"), *vals)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("aoi_id", list_key(*vals).alias("list_key"), "cnt")
    )


def raster_average(target: DataFrame, mask: DataFrame) -> DataFrame:
    """O3 RasterAverage (Geoprocessing.scala:245-277): ungrouped mean of the
    target over the AOI. NODATA target cells are coerced to 0.0 and *still
    counted in the denominator* (:266-270) — ``avg(coalesce(v, 0.0))``, not
    ``avg(v)``. The row set is mask ∩ target-present pixels (inner join):
    the reference iterates the *target layer's* tiles, so mask pixels on
    tiles absent from the target are never visited (NODATA cells on
    present tiles ARE rows with NULL value and are visited). Result key
    is literally ``"List(0)"`` (:275).

    Output: ``(list_key STRING, avg_value DOUBLE)``.
    """
    return (
        mask.select(*PIXEL_KEY)
        .join(target, on=PIXEL_KEY, how="inner")
        .agg(F.avg(F.coalesce(F.col("value"), F.lit(0.0))).alias("avg_value"))
        .select(F.lit("List(0)").alias("list_key"), "avg_value")
    )


def raster_grouped_average(
    layers: Sequence[DataFrame], target: DataFrame, mask: DataFrame
) -> DataFrame:
    """O4 RasterGroupedAverage (Geoprocessing.scala:288-329): mean of the
    target per distinct tuple of group-raster values within the AOI; NODATA
    target -> 0.0 as in O3; group tuples may contain NODATA ints.

    Key-set semantics: the reference joins ``targetLayer +: rasterLayers``
    (joinCollectionLayers, Utils.scala:221-232), so the pixel universe is
    the UNION of target and group keys — a target pixel on a tile the
    group layers miss is still counted, under an all-NODATA group tuple.
    Hence the FULL OUTER target join with a NODATA re-fill.

    Output: ``(list_key STRING, avg_value DOUBLE)``.
    """
    vals = _value_cols(len(layers))
    uni = join_layers(layers).join(
        target.withColumnRenamed("value", "_target"), on=PIXEL_KEY, how="full"
    )
    refill = [
        F.coalesce(F.col(f"v{i}"), F.lit(NODATA_INT)).alias(f"v{i}")
        for i in range(1, len(layers) + 1)
    ]
    return (
        uni.select(*PIXEL_KEY, *refill, "_target")
        .join(mask.select(*PIXEL_KEY), on=PIXEL_KEY, how="inner")
        .groupBy(*vals)
        .agg(F.avg(F.coalesce(F.col("_target"), F.lit(0.0))).alias("avg_value"))
        .select(list_key(*vals).alias("list_key"), "avg_value")
    )


def raster_grouped_sum(
    layers: Sequence[DataFrame], target: DataFrame, mask: DataFrame
) -> DataFrame:
    """O8 RasterGroupedSum (reference CHANGELOG.md:151-153, historical
    v1.2.0 operator): sum of the target grouped by the raster-value tuple,
    clipped to the AOI. NULL target cells contribute 0.

    Key set: the group layers' key union (target left-joined) — the
    historical operator has no current reference implementation to
    mirror, so the declared contract is: target pixels outside the group
    layers' tiles are not counted (documented divergence from O4's
    union semantics).

    Output: ``(list_key STRING, sum_value DOUBLE)``.
    """
    vals = _value_cols(len(layers))
    # merge hints (optimization r14): both the mask and the target are
    # bucketed on the pixel key -> the whole chain is zero-exchange
    # sort-merge (measured 1.22 s -> 0.85 s median at sf0.1 bucketed;
    # the unhinted plan broadcast-built both sides per fresh plan)
    return (
        join_layers(layers)
        .join(mask.select(*PIXEL_KEY).hint("merge"), on=PIXEL_KEY, how="inner")
        .join(
            target.withColumnRenamed("value", "_target").hint("merge"),
            on=PIXEL_KEY,
            how="left",
        )
        .groupBy(*vals)
        .agg(F.sum(F.coalesce(F.col("_target"), F.lit(0.0))).alias("sum_value"))
        .select(list_key(*vals).alias("list_key"), "sum_value")
    )


def raster_lines_join(
    layers: Sequence[DataFrame], line_pixels: DataFrame, mask: DataFrame
) -> DataFrame:
    """O5 RasterLinesJoin (Geoprocessing.scala:210-235): count of *distinct
    pixels* touched by >=1 rasterized line, grouped by the raster-value
    tuple at the pixel. Lines are clipped to the AOI first (Utils.scala:
    196-198); a pixel crossed by 5 lines counts once (:225-227).

    Distinctness needs NO explicit dropDuplicates (the r5 10-exchange
    regression): both clips are LEFT SEMI joins — the joined layers have
    one row per pixel (full outer of unique-keyed layers), so a semi
    join against the (duplicated) AOI-clipped line pixels matches each
    pixel at most once, and the semi join's build-side hash table dedups
    for free. Two joins + one aggregate; the per-pixel dedup exchange
    and its double HashAggregate disappear from the plan.

    Output: ``(list_key STRING, cnt BIGINT)``.
    """
    vals = _value_cols(len(layers))
    # merge hints (optimization r14): line pixels and mask are both
    # bucketed on the pixel key -> both semi joins are zero-exchange
    # sort-merge (measured 1.48 s -> 0.91 s median at sf0.1 bucketed;
    # the unhinted plan broadcast-built each semi-join build side per
    # fresh plan)
    line_in_aoi = line_pixels.select(*PIXEL_KEY).join(
        mask.select(*PIXEL_KEY).hint("merge"),
        on=PIXEL_KEY,
        how="left_semi",  # clip to AOI
    )
    return (
        join_layers(layers)
        .join(line_in_aoi.hint("merge"), on=PIXEL_KEY, how="left_semi")
        .groupBy(*vals)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(list_key(*vals).alias("list_key"), "cnt")
    )


def raster_summary(targets: Sequence[DataFrame], mask: DataFrame) -> DataFrame:
    """O6 RasterSummary (Geoprocessing.scala:380-431): per input raster (in
    input order) ``{min, avg, max}`` over AOI pixels. min/max skip NODATA
    (Utils.scala:266-284 combiners' evident intent); avg = sum/count over
    *all* rasterized pixels with NODATA as 0 (:385-393,427).

    One pass (optimization round 14, guide §2.4): instead of a UNION of
    N mask-join branches (N mask scans, N+1 Exchanges), every target is
    LEFT-joined onto the mask rows once (bucketed pixel key -> zero-
    exchange sort-merge joins; each target has at most one row per
    pixel, so mask row count is preserved) and all 3N statistics land
    in ONE global aggregate; ``inline()`` unpivots the single stat row
    back into the per-raster shape. The per-branch COUNT(*) equals the
    shared mask row count, so ``sum(coalesce(v,0))/n`` is the identical
    avg; an empty mask yields zero rows via the ``n > 0`` guard (the
    union shape's empty-aggregate contract).

    Output: ``(raster_idx INT, min_value, avg_value, max_value DOUBLE)``.
    """
    joined = mask.select(*PIXEL_KEY)
    for i, t in enumerate(targets):
        # merge hint: keep the zero-exchange co-bucketed sort-merge
        # chain — the planner would otherwise broadcast each target
        # (a shape that cannot exist at 100 TB; see mapshed note)
        joined = joined.join(
            t.selectExpr(*PIXEL_KEY, f"value AS _t{i}").hint("merge"),
            on=PIXEL_KEY,
            how="left",
        )
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("_n")]
    for i in range(len(targets)):
        aggs.append(F.min(f"_t{i}").alias(f"_mn{i}"))  # min/max skip NULLs
        aggs.append(F.sum(F.coalesce(F.col(f"_t{i}"), F.lit(0.0))).alias(f"_sm{i}"))
        aggs.append(F.max(f"_t{i}").alias(f"_mx{i}"))
    structs = ", ".join(
        f"named_struct('raster_idx', {i}, 'min_value', _mn{i}, "
        f"'avg_value', _sm{i} / _n, 'max_value', _mx{i})"
        for i in range(len(targets))
    )
    return (
        joined.agg(*aggs)
        .where(F.col("_n") > 0)
        .selectExpr(f"inline(array({structs}))")
        .orderBy("raster_idx")
    )


def multi_operation(
    grouped_counts: dict[str, tuple[Sequence[DataFrame], DataFrame]] | None = None,
    grouped_averages: dict[str, tuple[Sequence[DataFrame], DataFrame, DataFrame]] | None = None,
    averages: dict[str, tuple[DataFrame, DataFrame]] | None = None,
) -> DataFrame:
    """O7 MultiOperation (Geoprocessing.scala:21-89): M shapes x K ops in a
    batch. The reference's key optimization — fetch every distinct raster
    once for the union AOI and share it across (shape, op) pairs
    (CHANGELOG.md:82-91) — maps to sharing the cached layer DataFrames the
    caller passes in; the fan-out itself is a UNION of light plans, all
    values cast to DOUBLE (the reference's /multi result type).

    Output: ``(op_label STRING, list_key STRING, value DOUBLE)`` flattened;
    the nested ``{hucId: {op: result}}`` shape is a driver-side pivot.
    """
    parts: list[DataFrame] = []
    for label, (layers, mask_many) in (grouped_counts or {}).items():
        parts.append(
            raster_grouped_count_many(layers, mask_many).select(
                F.concat(F.lit(label + ":"), F.col("aoi_id")).alias("op_label"),
                "list_key",
                F.col("cnt").cast("double").alias("value"),
            )
        )
    for label, (layers, target, mask) in (grouped_averages or {}).items():
        parts.append(
            raster_grouped_average(layers, target, mask).select(
                F.lit(label).alias("op_label"), "list_key", F.col("avg_value").alias("value")
            )
        )
    for label, (target, mask) in (averages or {}).items():
        parts.append(
            raster_average(target, mask).select(
                F.lit(label).alias("op_label"), "list_key", F.col("avg_value").alias("value")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _parent_key_cols(tile_size: int, factor: int) -> list[F.Column]:
    """Child pixel key -> parent pixel key (one pyramid step down).

    ``pmod`` + float-division ``floor`` (not Spark's sign-following
    ``%`` / int division), so the decomposition is correct for NEGATIVE
    grid coordinates too — catalog layers whose extent lies below/left
    of the layout origin have negative key_col/key_row, and
    ``floor(g/f)*T + pmod(g,T) == g`` must hold for every sign."""
    T = tile_size
    gx = F.col("key_col") * T + F.col("cell_col")
    gy = F.col("key_row") * T + F.col("cell_row")
    px = F.floor(gx / factor).cast("int")
    py = F.floor(gy / factor).cast("int")
    return [
        F.floor(px / T).cast("int").alias("key_col"),
        F.floor(py / T).cast("int").alias("key_row"),
        F.pmod(px, F.lit(T)).cast("int").alias("cell_col"),
        F.pmod(py, F.lit(T)).cast("int").alias("cell_row"),
    ]


def pyramid_down_keys(
    pixels: DataFrame,
    extra_cols: Sequence[str] = (),
    tile_size: int = 8,
    factor: int = 2,
) -> DataFrame:
    """Coarsen a *pixel-set* table (an AOI mask or rasterized line
    pixels — no ``value`` column) by one pyramid level: a parent cell is
    present iff >=1 child cell is present (conservative cover, the
    rasterizer's own any-intersection convention). ``extra_cols``
    (e.g. ``aoi_id`` / ``line_id``) ride along and join the dedup key.

    One shuffle (the dropDuplicates partial-distinct collapses the
    factor^2 children map-side) — same scale shape as pyramid_down."""
    cols = list(extra_cols)
    out = pixels.select(*cols, *_parent_key_cols(tile_size, factor))
    return out.dropDuplicates([*cols, *PIXEL_KEY])


def pyramid_down(
    pixels: DataFrame, tile_size: int = 8, factor: int = 2, agg: str = "mode"
) -> DataFrame:
    """Build the next pyramid level DOWN (coarser) from a pixel table:
    each ``factor x factor`` block of child cells collapses to one
    parent cell in the same world frame (parent cellsize = child
    cellsize * factor — e.g. the zoom-13 -> zoom-12 step of the
    reference's layer pyramid, whose catalogs store one such level per
    zoom; scripts/benchmark-mapshed:31-34 layer naming).

    ``agg``:
    - ``"mode"`` (categorical rasters like NLCD): most frequent child
      value per block, ties to the SMALLEST value, NULLs (NODATA) not
      voting; a block of only-NULL children yields NULL.
    - ``"avg"`` (continuous rasters): mean of non-NULL children.

    Scale shape: one shuffle on the parent pixel key (plus one more for
    mode's per-value counting) — pyramid building over 100 TB is a
    single pass per level, and levels halve in size.

    Output: the same pixel-table schema, keyed in the parent grid.
    """
    parented = pixels.select(*_parent_key_cols(tile_size, factor), "value")
    if agg == "avg":
        return parented.groupBy(*PIXEL_KEY).agg(F.avg("value").alias("value"))
    if agg != "mode":
        raise ValueError(f"agg must be 'mode' or 'avg', got {agg!r}")
    from pyspark.sql import Window

    counts = (
        parented.where(F.col("value").isNotNull())
        .groupBy(*PIXEL_KEY, "value")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy(*PIXEL_KEY).orderBy(F.col("cnt").desc(), F.col("value").asc())
    modes = (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(*PIXEL_KEY, "value")
    )
    # blocks whose children are ALL NODATA still exist at the parent
    # level (as NODATA cells) — restore them via the distinct parent set
    parents = parented.select(*PIXEL_KEY).dropDuplicates(PIXEL_KEY)
    return parents.join(modes, on=PIXEL_KEY, how="left").select(*PIXEL_KEY, "value")
