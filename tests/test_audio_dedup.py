"""Audio near-dup (round 13): WAV codec round-trip pinned
energy-exact, injected structure recovered, banded plan asserted,
oracle hash-gated at fixture scale."""

from __future__ import annotations

import pytest

from mmw_geoprocessing_spark.operators import audio_dedup as au
from tests.conftest import SF_DIR


def _docs(spark, n=64):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def test_wav_round_trips_the_closed_form_energies(spark):
    """wave-encode -> _decode_wav -> per-frame sums == the _energy
    closed form (PCM is lossless; this is what lets the oracle replay
    framing and energies arithmetically)."""
    rows = {r["doc_id"]: r for r in au.audio_energy_fingerprints(_docs(spark, 16)).collect()}
    for d in range(16):
        g, v = d // au.GROUP_SIZE, d % 4
        for f in range(au.N_FRAMES):
            assert rows[d][f"e{f}"] == au._energy(g, v, f), (d, f)


def test_injected_structure_recovered_and_linear(spark):
    """Same-variant docs in a group share all 16 frames (exact dup);
    variant 1 shares exactly 15 with variant 0 (the one-frame edit);
    heavy variants never match the base; pair count stays linear."""
    pairs = {
        (r["a_id"], r["b_id"]): r["n_shared"]
        for r in au.dedup_audio_energy(_docs(spark, 64)).collect()
    }
    for g in range(8):
        base = g * au.GROUP_SIZE
        for v in range(4):
            assert pairs.get((base + v, base + v + 4)) == au.N_FRAMES
        for a in (base, base + 4):
            for b in (base + 1, base + 5):
                key = (min(a, b), max(a, b))
                assert pairs.get(key) == au.N_FRAMES - 1, (key, pairs.get(key))
    # nothing else pairs at this scale (heavy variants are independent)
    assert len(pairs) == 8 * 8
    # and at 2000 groups the rate stays linear (the image family's
    # three at-scale texture failures are the regression class here)
    n = 16_384
    count = au.dedup_audio_energy(_docs(spark, n)).count()
    groups = n // au.GROUP_SIZE
    assert 8 * groups * 0.9 <= count <= 10 * groups, count


def test_banded_plan_has_no_cartesian(spark):
    plan = (
        au.dedup_audio_energy(_docs(spark, 64))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_fingerprint_rejects_wrong_shape(spark):
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(8000)
        w.writeframes(np.zeros(100, dtype="<i2").tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()))], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="sample clips"):
        au.audio_fingerprint(df).collect()


def test_matches_oracle_at_fixture(spark, tables):
    import duckdb

    from mmw_geoprocessing_spark.sources.tables import TABLE_NAMES, load_table

    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    docs = load_table(spark, SF_DIR, "documents")
    sdf = au.dedup_audio_energy(docs).toPandas()
    ddf = con.execute(au.dedup_audio_energy_sql()).df()
    cols = sorted(sdf.columns)
    s2 = sdf[cols].sort_values(cols).reset_index(drop=True)
    d2 = ddf[cols].sort_values(cols).reset_index(drop=True)
    assert s2.equals(d2.astype(s2.dtypes.to_dict()))
    con.close()
