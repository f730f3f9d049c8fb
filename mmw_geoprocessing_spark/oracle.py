"""DuckDB oracle SQL builders for the zonal operators.

Each function returns ANSI SQL (DuckDB-compatible) computing the same
result as the corresponding operator in ``operators/zonal.py``, over the
same fixture CTEs (``sources/fixtures.py``) — the driver runs these side
by side with the Spark plans and hash-compares the outputs.

Semantics mirrored line-for-line with the reference citations in the
operator docstrings; the one-sentence contract is repeated here so a
reviewer can diff Spark plan vs SQL without flipping files.
"""

from __future__ import annotations

from collections.abc import Sequence

from mmw_geoprocessing_spark.functions.nodata import NODATA_INT
from mmw_geoprocessing_spark.sources.fixtures import with_fixtures

PK = "key_col, key_row, cell_col, cell_row"


def _joined_cte(rasters: Sequence[str], tag: str = "") -> tuple[str, list[str]]:
    """CTE text for the N-way full-outer NODATA-filled layer join
    (reference Utils.scala:221-232). ``tag`` namespaces the helper CTE
    names so several joins can coexist in one WITH clause (the joined
    CTE becomes ``joined_{tag}``)."""
    suffix = f"_{tag}" if tag else ""
    aliases = [f"_lyr{suffix}_{i}" for i in range(1, len(rasters) + 1)]
    pre = ", ".join(
        f"{a} AS (SELECT {PK}, value AS w{i} FROM r_{r})"
        for i, (a, r) in enumerate(zip(aliases, rasters), start=1)
    )
    joins = aliases[0]
    for a in aliases[1:]:
        joins += f" FULL OUTER JOIN {a} USING ({PK})"
    fills = ", ".join(
        f"COALESCE(w{i}, {NODATA_INT}) AS v{i}" for i in range(1, len(rasters) + 1)
    )
    return f"{pre}, joined{suffix} AS (SELECT {PK}, {fills} FROM {joins})", aliases


def _list_key(n: int) -> str:
    inner = " || ', ' || ".join(f"CAST(v{i} AS VARCHAR)" for i in range(1, n + 1))
    return f"'List(' || {inner} || ')'"


def grouped_count(rasters: Sequence[str], aoi_id: str) -> str:
    ctes, _ = _joined_cte(rasters)
    body = (
        f"SELECT {_list_key(len(rasters))} AS list_key, COUNT(*) AS cnt "
        f"FROM joined JOIN mask_{aoi_id} USING ({PK}) "
        f"GROUP BY {', '.join(f'v{i}' for i in range(1, len(rasters) + 1))}"
    )
    return with_fixtures(
        body, *[f"r_{r}" for r in rasters], f"mask_{aoi_id}", extra_ctes=ctes
    )


def grouped_count_many(rasters: Sequence[str]) -> str:
    ctes, _ = _joined_cte(rasters)
    vs = ", ".join(f"v{i}" for i in range(1, len(rasters) + 1))
    body = (
        f"SELECT aoi_id, {_list_key(len(rasters))} AS list_key, COUNT(*) AS cnt "
        f"FROM joined JOIN mask_all USING ({PK}) "
        f"GROUP BY aoi_id, {vs}"
    )
    return with_fixtures(body, *[f"r_{r}" for r in rasters], "mask_all", extra_ctes=ctes)


def average(target: str, aoi_id: str) -> str:
    # inner join: mask pixels on tiles absent from the target are never
    # visited (zonal.raster_average key-set semantics)
    body = (
        f"SELECT 'List(0)' AS list_key, AVG(COALESCE(t.value, 0.0)) AS avg_value "
        f"FROM mask_{aoi_id} m JOIN r_{target} t USING ({PK})"
    )
    return with_fixtures(body, f"r_{target}", f"mask_{aoi_id}")


def _target_union_cte(rasters: Sequence[str], target: str, tag: str = "") -> str:
    """joined FULL OUTER target with NODATA re-fill — the reference's
    joinCollectionLayers(target +: layers) key-set union
    (zonal.raster_grouped_average semantics). Produces ``uni{_tag}``."""
    ctes, _ = _joined_cte(rasters, tag=tag)
    suffix = f"_{tag}" if tag else ""
    refill = ", ".join(
        f"COALESCE(v{i}, {NODATA_INT}) AS v{i}" for i in range(1, len(rasters) + 1)
    )
    uni = (
        f"uni{suffix} AS (SELECT {PK}, {refill}, t.value AS tval "
        f"FROM joined{suffix} FULL OUTER JOIN r_{target} t USING ({PK}))"
    )
    return f"{ctes}, {uni}"


def grouped_average(rasters: Sequence[str], target: str, aoi_id: str) -> str:
    ctes = _target_union_cte(rasters, target)
    vs = ", ".join(f"v{i}" for i in range(1, len(rasters) + 1))
    body = (
        f"SELECT {_list_key(len(rasters))} AS list_key, "
        f"AVG(COALESCE(tval, 0.0)) AS avg_value "
        f"FROM uni JOIN mask_{aoi_id} USING ({PK}) "
        f"GROUP BY {vs}"
    )
    return with_fixtures(
        body, *[f"r_{r}" for r in rasters], f"r_{target}", f"mask_{aoi_id}",
        extra_ctes=ctes,
    )


def grouped_sum(rasters: Sequence[str], target: str, aoi_id: str) -> str:
    # group-layer key set (target left-joined) — O8's declared contract
    ctes, _ = _joined_cte(rasters)
    vs = ", ".join(f"v{i}" for i in range(1, len(rasters) + 1))
    body = (
        f"SELECT {_list_key(len(rasters))} AS list_key, "
        f"SUM(COALESCE(t.value, 0.0)) AS sum_value "
        f"FROM joined JOIN mask_{aoi_id} USING ({PK}) "
        f"LEFT JOIN r_{target} t USING ({PK}) "
        f"GROUP BY {vs}"
    )
    return with_fixtures(
        body, *[f"r_{r}" for r in rasters], f"r_{target}", f"mask_{aoi_id}",
        extra_ctes=ctes,
    )


def lines_join(rasters: Sequence[str], aoi_id: str) -> str:
    ctes, _ = _joined_cte(rasters)
    vs = ", ".join(f"v{i}" for i in range(1, len(rasters) + 1))
    lp = f"lp AS (SELECT DISTINCT {PK} FROM line_pixels JOIN mask_{aoi_id} USING ({PK}))"
    body = (
        f"SELECT {_list_key(len(rasters))} AS list_key, COUNT(*) AS cnt "
        f"FROM joined JOIN lp USING ({PK}) "
        f"GROUP BY {vs}"
    )
    return with_fixtures(
        body, *[f"r_{r}" for r in rasters], "line_pixels", f"mask_{aoi_id}",
        extra_ctes=f"{ctes}, {lp}",
    )


def summary(targets: Sequence[str], aoi_id: str) -> str:
    parts = " UNION ALL ".join(
        f"SELECT {i} AS raster_idx, t.value FROM mask_{aoi_id} m "
        f"LEFT JOIN r_{t} t USING ({PK})"
        for i, t in enumerate(targets)
    )
    body = (
        f"SELECT raster_idx, MIN(value) AS min_value, "
        f"SUM(COALESCE(value, 0.0)) / COUNT(*) AS avg_value, "
        f"MAX(value) AS max_value "
        f"FROM tagged GROUP BY raster_idx ORDER BY raster_idx"
    )
    return with_fixtures(
        body, *[f"r_{t}" for t in targets], f"mask_{aoi_id}",
        extra_ctes=f"tagged AS ({parts})",
    )


def multi(
    grouped_counts: dict[str, Sequence[str]],
    grouped_averages: dict[str, tuple[Sequence[str], str, str]],
    averages: dict[str, tuple[str, str]],
) -> str:
    """Flattened /multi: union of per-op oracle results, values as DOUBLE."""
    selects: list[str] = []
    for label, rasters in grouped_counts.items():
        inner = grouped_count_many(rasters)
        selects.append(
            f"SELECT '{label}:' || aoi_id AS op_label, list_key, "
            f"CAST(cnt AS DOUBLE) AS value FROM ({inner})"
        )
    for label, (rasters, target, aoi_id) in grouped_averages.items():
        inner = grouped_average(rasters, target, aoi_id)
        selects.append(
            f"SELECT '{label}' AS op_label, list_key, avg_value AS value FROM ({inner})"
        )
    for label, (target, aoi_id) in averages.items():
        inner = average(target, aoi_id)
        selects.append(
            f"SELECT '{label}' AS op_label, list_key, avg_value AS value FROM ({inner})"
        )
    return " UNION ALL ".join(selects)


def mapshed_suite(aoi_ids: Sequence[str], labels: Sequence[str] | None = None) -> str:
    """Oracle for the single-pass 7-template MapShed/Subbasin suite
    (operators/mapshed.py) — every template grouped by aoi_id.

    ``labels``: restrict to a subset of templates. Used by the sf10
    gate's sharded-oracle mode (tools/sf10_sharded.py): the full
    10-template union in ONE DuckDB statement materializes every
    joined-raster CTE simultaneously and exhausts spill disk at the
    100x replica; per-template statements are individually feasible and
    their union is definitionally the full oracle (the outer query is a
    UNION ALL over independent template SELECTs)."""
    from mmw_geoprocessing_spark.operators.mapshed import TEMPLATES

    aoi_list = ", ".join(f"'{a}'" for a in aoi_ids)
    selects: list[str] = []
    needed: set[str] = {"mask_all"}
    extra = [f"mask_f AS (SELECT * FROM mask_all WHERE aoi_id IN ({aoi_list}))"]
    joined_defs: dict[tuple[str, ...], str] = {}

    def joined_for(rasters: tuple[str, ...]) -> str:
        if rasters not in joined_defs:
            tag = "_".join(rasters)
            ctes, _ = _joined_cte(rasters, tag=tag)
            extra.append(ctes)
            joined_defs[rasters] = f"joined_{tag}"
            needed.update(f"r_{r}" for r in rasters)
        return joined_defs[rasters]

    for label, (kind, rasters, target) in TEMPLATES.items():
        if labels is not None and label not in labels:
            continue
        vs = ", ".join(f"v{i}" for i in range(1, len(rasters) + 1))
        if kind in ("grouped_count", "lines_join"):
            j = joined_for(tuple(rasters))
            src = f"{j} JOIN mask_f USING ({PK})"
            if kind == "lines_join":
                needed.add("line_pixels")
                lp = (
                    f"lp_{label} AS (SELECT DISTINCT aoi_id, {PK} "
                    f"FROM line_pixels JOIN mask_f USING ({PK}))"
                )
                extra.append(lp)
                src = f"{j} JOIN lp_{label} USING ({PK})"
            selects.append(
                f"SELECT '{label}' AS op_label, aoi_id, "
                f"{_list_key(len(rasters))} AS list_key, "
                f"CAST(COUNT(*) AS DOUBLE) AS value FROM {src} "
                f"GROUP BY aoi_id, {vs}"
            )
        elif kind == "average":
            needed.add(f"r_{target}")
            selects.append(
                f"SELECT '{label}' AS op_label, aoi_id, 'List(0)' AS list_key, "
                f"AVG(COALESCE(t.value, 0.0)) AS value "
                f"FROM mask_f JOIN r_{target} t USING ({PK}) GROUP BY aoi_id"
            )
        else:  # grouped_average: union key set (full-outer target)
            key = tuple(rasters)
            tag = "_".join(key) + f"_{target}"
            if (key, target) not in joined_defs:
                extra.append(_target_union_cte(rasters, target, tag=tag))
                joined_defs[(key, target)] = f"uni_{tag}"
                needed.update(f"r_{r}" for r in rasters)
                needed.add(f"r_{target}")
            u = joined_defs[(key, target)]
            selects.append(
                f"SELECT '{label}' AS op_label, aoi_id, "
                f"{_list_key(len(rasters))} AS list_key, "
                f"AVG(COALESCE(tval, 0.0)) AS value "
                f"FROM {u} JOIN mask_f USING ({PK}) "
                f"GROUP BY aoi_id, {vs}"
            )

    body = " UNION ALL ".join(selects)
    return with_fixtures(body, *sorted(needed), extra_ctes=", ".join(extra))
