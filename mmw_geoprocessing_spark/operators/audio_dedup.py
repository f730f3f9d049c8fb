"""Audio near-dup — frame-energy fingerprints over real WAV/PCM +
shared-frame matching (the image family's sibling for the audio
modality, round 13).

A crawl's audio corpus repeats the same clip re-encoded or lightly
edited. The classic fingerprint family (Shazam's constellation, Haitsma
& Kalker's robust hash) reduces a clip to a small sequence of per-frame
features and matches clips that share features at the same position.
This operator implements the honestly-simplified integer core:

- **fingerprint**: the clip is divided into ``N_FRAMES`` fixed frames;
  the feature per frame is its ENERGY (sum of 16-bit PCM samples) —
  integer-exact, so the DuckDB oracle can replay it (the repo's
  integer-BM25 / image-phash contract; a real deployment swaps the
  energy kernel for spectral peaks without touching the plan).
- **matching**: candidate pairs share (frame_idx, energy) for at least
  one frame — one exchange on the (frame, value) key, NEVER all-pairs —
  and are verified by the exact count of shared frames
  ``>= MATCH_FRAMES_T``. A clip edited in ONE frame still shares 15 and
  is guaranteed-recall; unrelated clips collide per frame with
  probability ~2^-16 (the knob: feature width, exactly like the image
  family's chunk width).

Pipeline shape (the multimodal contract): the fixture corpus carries no
audio, so ``attach_audio`` synthesizes a deterministic 16-bit PCM WAV
per document — REAL bytes through the stdlib ``wave`` encoder — and the
fingerprint stage decodes them back with the real decoder
(``multimodal._decode_wav``) inside one Arrow-batched ``mapInPandas``.
The WAV codec is lossless for PCM and the frame energies are a closed
form of ``doc_id``, so the oracle replays container, framing and
energies exactly.

Injected structure (the image family's conventions, with its THREE
at-scale texture failures applied from the start): groups of 8
consecutive doc_ids share a base clip; variant ``doc_id % 4`` is
0 = base, 1 = base with ONE frame's energy bumped (shares 15 frames —
guaranteed-recall near-dup), 2/3 = independent re-synths. Every frame
energy mixes the group hash with an INDEPENDENT md5-derived multiplier
modulo a large prime (cross-group matches at the random-16-bit rate;
the linear/sequential textures that went quadratic at the image
family's replicas never ship here).

100 TB shape: fingerprinting is per-clip CPU in Arrow batches (the
decode a pipeline pays once anyway); banding shuffles N_FRAMES tiny
rows per clip; verification touches only candidate pairs.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.functions.plan_cache import PlanCache

#: clip geometry: N_FRAMES frames x SAMPLES_PER_FRAME 16-bit samples
N_FRAMES, SAMPLES_PER_FRAME = 16, 16
SAMPLE_RATE = 8_000

#: consecutive doc_ids sharing one base clip (pair count stays linear)
GROUP_SIZE = 8

#: verified match threshold: shared frames out of N_FRAMES (15 = one
#: edited frame tolerated, the guaranteed-recall case)
MATCH_FRAMES_T = 15

_HASH_MOD = 2_147_483_647  # > max group id at every replica (see image twin)
_HASH_MUL = 2_654_435_761
_HASH_CAP = 2_147_483_648
_MIX_P = 2_147_483_647
_E_MOD = 65_536  # energies are 16-bit (the feature-width knob)

_FP_CACHE = PlanCache()


def clear_audio_fp_cache() -> None:
    """Explicit invalidate hook (corpus replacement in a live session)."""
    _FP_CACHE.clear()


def _frame_const(salt: int, f: int) -> int:
    """Independent md5-derived odd 30-bit multiplier per (variant
    table, frame) — embedded as a LITERAL in both twins."""
    import hashlib

    digest = hashlib.md5(f"audiotex:{salt}:{f}".encode()).hexdigest()
    return (int(digest[:8], 16) % (1 << 30)) | 1


def _energy(g: int, v: int, f: int) -> int:
    """The closed-form frame energy the oracle replays (g = doc group,
    v = variant, f = frame index)."""
    h = (g % _HASH_MOD) * _HASH_MUL % _HASH_CAP
    if v == 2:
        return (h * _frame_const(2, f) % _MIX_P + 13) % _E_MOD
    if v == 3:
        return (h * _frame_const(3, f) % _MIX_P + 101) % _E_MOD
    base = (h * _frame_const(0, f) % _MIX_P) % _E_MOD
    if v == 1 and f == g % N_FRAMES:
        return (base + 7_777) % _E_MOD
    return base


def _energy_sql(f: int) -> str:
    """DuckDB expression for frame ``f``'s energy of ``doc_id``."""
    h = f"(((doc_id // {GROUP_SIZE}) % {_HASH_MOD}) * {_HASH_MUL} % {_HASH_CAP})"
    base = f"({h} * {_frame_const(0, f)} % {_MIX_P}) % {_E_MOD}"
    bump = (
        f"CASE WHEN doc_id % 4 = 1 AND (doc_id // {GROUP_SIZE}) % {N_FRAMES} = {f} "
        f"THEN 7777 ELSE 0 END"
    )
    return (
        f"CASE WHEN doc_id % 4 = 2 "
        f"THEN ({h} * {_frame_const(2, f)} % {_MIX_P} + 13) % {_E_MOD} "
        f"WHEN doc_id % 4 = 3 "
        f"THEN ({h} * {_frame_const(3, f)} % {_MIX_P} + 101) % {_E_MOD} "
        f"ELSE ({base} + {bump}) % {_E_MOD} END"
    )


def _samples_for(energies: list[int]) -> list[int]:
    """Frame energies -> PCM samples whose per-frame SUM recovers the
    energy exactly: each frame holds ``e // SAMPLES_PER_FRAME`` in every
    sample plus the remainder on the first (all values <= 4110 — well
    inside int16)."""
    out: list[int] = []
    for e in energies:
        q, r = divmod(e, SAMPLES_PER_FRAME)
        out.extend([q + r] + [q] * (SAMPLES_PER_FRAME - 1))
    return out


def attach_audio(documents: DataFrame) -> DataFrame:
    """Synthesize the deterministic 16-bit PCM WAV payload per document
    — REAL bytes via the stdlib ``wave`` encoder inside an Arrow-batched
    ``mapInPandas``. Output: ``(doc_id, payload binary)``."""

    def encode(batches: Iterator) -> Iterator:
        import io
        import wave

        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g, v = d // GROUP_SIZE, d % 4
                samples = _samples_for(
                    [_energy(g, v, f) for f in range(N_FRAMES)]
                )
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(SAMPLE_RATE)
                    w.writeframes(
                        np.asarray(samples, dtype="<i2").tobytes()
                    )
                rows.append({"doc_id": d, "payload": buf.getvalue()})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id").mapInPandas(
        encode, "doc_id long, payload binary"
    )


_FP_SCHEMA = "doc_id long, " + ", ".join(f"e{f} int" for f in range(N_FRAMES))


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Decode each WAV payload with the REAL stdlib decoder and emit
    the per-frame energies ``(doc_id, e0..e15)``. One Arrow-batched
    ``mapInPandas``; payloads never leave the executors."""

    def fp(batches: Iterator) -> Iterator:
        import pandas as pd

        from mmw_geoprocessing_spark.operators.multimodal import _decode_wav

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, nch, samples = _decode_wav(bytes(payload))
                if nch != 1 or len(samples) != N_FRAMES * SAMPLES_PER_FRAME:
                    raise NotImplementedError(
                        f"audio_fingerprint expects mono "
                        f"{N_FRAMES}x{SAMPLES_PER_FRAME}-sample clips; got "
                        f"{nch} ch x {len(samples)} samples (resample/"
                        f"frame-align upstream)"
                    )
                mat = samples.astype("int64").reshape(
                    N_FRAMES, SAMPLES_PER_FRAME
                )
                row = {"doc_id": int(doc_id)}
                for f, e in enumerate(mat.sum(axis=1)):
                    row[f"e{f}"] = int(e)
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=["doc_id"] + [f"e{f}" for f in range(N_FRAMES)]
            )

    return media.mapInPandas(fp, _FP_SCHEMA)


def audio_energy_fingerprints(documents: DataFrame) -> DataFrame:
    """Registry row: synthesize -> WAV-encode -> decode -> energies,
    the full binary round trip. Persisted per (session, corpus): the
    matcher self-joins this table (the image family's 9.29x lesson)."""
    return _FP_CACHE.get_or_persist(
        documents, "audio_energy_fp", lambda d: audio_fingerprint(attach_audio(d))
    )


def audio_energy_fingerprints_sql() -> str:
    cols = ", ".join(
        f"CAST({_energy_sql(f)} AS INT) AS e{f}" for f in range(N_FRAMES)
    )
    return f"SELECT doc_id, {cols} FROM documents"


def dedup_audio_energy(documents: DataFrame) -> DataFrame:
    """Shared-frame audio near-dup: candidates share (frame_idx,
    energy) for >= 1 frame, verified by the exact shared-frame count
    ``>= MATCH_FRAMES_T``. Output: ``(a_id, b_id, n_shared)`` with
    a_id < b_id (n_shared = 16 is the re-encoded exact dup, 15 the
    one-frame edit).

    Plan shape: ONE shuffle — group the band rows by the packed key
    ``fi * 2^16 + ev``, then enumerate each bucket's doc pairs
    JVM-side (``transform``/``slice`` over the sorted doc list). The
    standard LSH-bucket pair enumeration; measured at the 100×
    replica it replaced the band self-join's two 8 M-row exchanges
    and ran 17.9 s → 5.9 s. A bucket with k docs expands k²/2 pairs
    in one task — bounded by the fixture's design (~4 docs/bucket)
    and by 16-bit feature width in general; a deployment facing an
    adversarial hot feature value (e.g. digital silence) pre-filters
    it like a stopword — the same hot-band answer as minhash LSH."""
    fp = audio_energy_fingerprints(documents)
    band = F.explode(
        F.array(
            *[
                F.struct(F.lit(f).alias("fi"), F.col(f"e{f}").alias("ev"))
                for f in range(N_FRAMES)
            ]
        )
    )
    bands = fp.select("doc_id", band.alias("b")).select(
        "doc_id", (F.col("b.fi") * 65536 + F.col("b.ev")).alias("bk")
    )
    buckets = (
        bands.groupBy("bk")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") > 1)
    )
    pairs = buckets.select(
        F.explode(
            F.expr(
                "flatten(transform(ds, (x, i) -> "
                "transform(slice(ds, i + 2, size(ds) - i - 1), "
                "y -> struct(x AS a_id, y AS b_id))))"
            )
        ).alias("p")
    ).select("p.a_id", "p.b_id")
    return (
        pairs.groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_shared"))
        .filter(F.col("n_shared") >= MATCH_FRAMES_T)
    )


def dedup_audio_energy_sql() -> str:
    cases = " ".join(
        f"WHEN {f} THEN e{f}" for f in range(N_FRAMES)
    )
    return f"""
    WITH fp AS ({audio_energy_fingerprints_sql()}),
    bands AS (
      SELECT doc_id, fi, CASE fi {cases} END AS ev
      FROM fp, UNNEST(range({N_FRAMES})) AS t(fi)
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(COUNT(*) AS INT) AS n_shared
    FROM bands a JOIN bands b ON a.fi = b.fi AND a.ev = b.ev
                             AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {MATCH_FRAMES_T}
    """
