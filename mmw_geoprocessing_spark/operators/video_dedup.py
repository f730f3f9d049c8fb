"""Video keyframe dedup — per-sampled-frame perceptual hashes +
doc-level shared-fingerprint matching (r13 verdict #7: the video
modality sibling composing ``multimodal.frame_sample``'s container
plumbing with the image phash family, in the audio matcher's shape).

A crawl's video corpus repeats the same clip re-encoded, re-muxed or
lightly edited. The standard pre-stage (the image family's dHash
lifted to clips) samples a few KEYFRAMES per clip, fingerprints each
with a perceptual hash, and matches clips that share frame
fingerprints at the same position:

- **container**: the fixture corpus carries no video, so
  ``attach_video`` synthesizes a deterministic clip per document —
  ``VKF_N_FRAMES`` real 8x9 grey PNG frames (REAL bytes through the
  pure-Python encoder) wrapped in a minimal length-prefixed container
  (magic + frame count + per-frame u32 lengths + frame payloads; PNG
  frame sizes VARY with content, so honest frame extraction needs the
  index — equal-byte slicing à la ``frame_sample`` would shear
  frames). A deployment swaps this parser for an mp4/mkv demuxer
  without touching the plan.
- **keyframe fingerprints**: each extracted frame decodes through the
  REAL PNG decoder and hashes to the image family's 64-bit dHash,
  packed as four 16-bit chunks — one Arrow-batched ``mapInPandas``
  for parse + decode + hash (payloads never leave the executors).
- **matching**: candidate pairs share (frame_idx, full 64-bit dHash)
  for >= 1 frame — ONE shuffle on the bucket key, never all-pairs —
  verified by the exact shared-frame count ``>= VKF_MATCH_T``. A clip
  with ONE replaced keyframe still shares N-1 and is
  guaranteed-recall; unrelated clips collide per frame at the
  random-64-bit rate (~5e-20).

Injected structure (the image/audio conventions, texture lessons
pre-applied): groups of 8 consecutive doc_ids share a base clip;
variant ``doc_id % 4`` is 0 = base, 1 = base with ONE keyframe
REPLACED (an exact-hash matcher needs whole-frame edits, not pixel
bumps — shares exactly N-1 frames), 2/3 = independent re-synths.
Every pixel mixes the group hash with an INDEPENDENT md5-derived
multiplier modulo a large prime (per (table, frame, y, x) — the
constant that kept the image family's cross-group collisions at the
random rate through the 100x replica).

Scale discipline (r13 verdict #10 — the histogram test shipped FIRST,
tests/test_video_dedup.py::test_pair_count_and_buckets_stay_linear_at_10x
ran green before this family was registered): bucket populations are
bounded by the 8-doc group design (max 4 docs share a frame hash) and
by 64-bit width in general; a real corpus' hot frame (black frame,
station logo) is additionally capped at ``VKF_BUCKET_CAP`` members
per bucket — deterministic doc_id order, replayed by the oracle, the
``IMG_BAND_CAP``/``NEARDUP_BUCKET_CAP`` pattern.

100 TB shape: fingerprinting is per-clip CPU inside Arrow batches (a
decode the pipeline pays once anyway); the match shuffles
VKF_N_FRAMES tiny rows per clip on a 64-bit-diverse key; pair
enumeration is in-bucket and capped. Reference parity note: the
reference has no video surface; this family belongs to the
training-data-pipeline tier (SURVEY §2.3 multimodal plumbing).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mmw_geoprocessing_spark.functions.plan_cache import PlanCache
from mmw_geoprocessing_spark.operators.image_dedup import (
    _HASH_CAP,
    _HASH_MOD,
    _HASH_MUL,
    _MIX_P,
    _PX_MOD,
    IMG_H,
    IMG_W,
    _chunk_sql,
)

#: keyframes sampled per clip
VKF_N_FRAMES = 4

#: consecutive doc_ids sharing one base clip (pair count stays linear)
GROUP_SIZE = 8

#: verified match threshold: shared keyframes out of VKF_N_FRAMES
#: (N-1 = one replaced keyframe tolerated, the guaranteed-recall case)
VKF_MATCH_T = VKF_N_FRAMES - 1

#: per-(frame_idx, dhash) bucket cap — the hot-frame (black frame,
#: station logo) bound; deterministic doc_id order, oracle-replayed
VKF_BUCKET_CAP = 256

_CONTAINER_MAGIC = b"VKF0"

_FP_CACHE = PlanCache()


def clear_video_fp_cache() -> None:
    """Explicit invalidate hook (corpus replacement in a live session)."""
    _FP_CACHE.clear()


def _vpixel_const(table: str, f: int, y: int, x: int) -> int:
    """Independent md5-derived odd 30-bit multiplier per (texture
    table, frame, pixel) — embedded as a LITERAL in both twins."""
    import hashlib

    digest = hashlib.md5(f"vidtex:{table}:{f}:{y}:{x}".encode()).hexdigest()
    return (int(digest[:8], 16) % (1 << 30)) | 1


def _vpx(g: int, v: int, f: int, y: int, x: int) -> int:
    """The closed-form pixel the oracle replays (g = doc group, v =
    variant, f = frame index). Variant 1 REPLACES frame ``g %
    VKF_N_FRAMES`` with the 'edit' texture table; variants 2/3 are
    independent clips under their own tables.

    ``g + 1`` (not ``g``) feeds the hash: g = 0 hashes to 0, and a
    zero hash makes EVERY variant a constant-color frame with the
    all-zero dHash — group 0's eight clips would all match each other
    at n_shared = N (the image family tolerates this corner; an
    exact-hash matcher cannot). h = 0 now needs g = _HASH_MOD - 1,
    beyond any replica."""
    h = ((g + 1) % _HASH_MOD) * _HASH_MUL % _HASH_CAP
    if v == 2:
        return (h * _vpixel_const("v2", f, y, x) % _MIX_P + 13) % _PX_MOD
    if v == 3:
        return (h * _vpixel_const("v3", f, y, x) % _MIX_P + 101) % _PX_MOD
    if v == 1 and f == g % VKF_N_FRAMES:
        return (h * _vpixel_const("edit", f, y, x) % _MIX_P + 57) % _PX_MOD
    return (h * _vpixel_const("base", f, y, x) % _MIX_P) % _PX_MOD


def _vpx_sql(f: int, y: int, x: int) -> str:
    """DuckDB expression for pixel (y, x) of frame ``f`` of
    ``doc_id``'s clip — everything folds to doc_id arithmetic; every
    intermediate stays under 2^61 for DuckDB's checked int64."""
    h = f"(((doc_id // {GROUP_SIZE} + 1) % {_HASH_MOD}) * {_HASH_MUL} % {_HASH_CAP})"
    return (
        f"CASE WHEN doc_id % 4 = 2 "
        f"THEN ({h} * {_vpixel_const('v2', f, y, x)} % {_MIX_P} + 13) % {_PX_MOD} "
        f"WHEN doc_id % 4 = 3 "
        f"THEN ({h} * {_vpixel_const('v3', f, y, x)} % {_MIX_P} + 101) % {_PX_MOD} "
        f"WHEN doc_id % 4 = 1 AND (doc_id // {GROUP_SIZE}) % {VKF_N_FRAMES} = {f} "
        f"THEN ({h} * {_vpixel_const('edit', f, y, x)} % {_MIX_P} + 57) % {_PX_MOD} "
        f"ELSE ({h} * {_vpixel_const('base', f, y, x)} % {_MIX_P}) % {_PX_MOD} END"
    )


def _pack_container(frames: list[bytes]) -> bytes:
    """magic + u8 frame count + per-frame u32be lengths + payloads."""
    head = _CONTAINER_MAGIC + struct.pack("B", len(frames))
    head += b"".join(struct.pack(">I", len(fr)) for fr in frames)
    return head + b"".join(frames)


def _unpack_container(payload: bytes) -> list[bytes]:
    if payload[:4] != _CONTAINER_MAGIC:
        raise NotImplementedError(
            f"video container magic {payload[:4]!r} is not "
            f"{_CONTAINER_MAGIC!r} (mp4/mkv demux is a deployment "
            "swap-in; the plan shape is identical)"
        )
    n = payload[4]
    lens = struct.unpack(f">{n}I", payload[5 : 5 + 4 * n])
    frames, off = [], 5 + 4 * n
    for ln in lens:
        frames.append(payload[off : off + ln])
        off += ln
    if off != len(payload):
        raise ValueError("video container trailing bytes")
    return frames


def attach_video(documents: DataFrame) -> DataFrame:
    """Synthesize the deterministic clip payload per document — REAL
    PNG frame bytes in the length-prefixed container, inside one
    Arrow-batched ``mapInPandas``. Output: ``(doc_id, payload)``."""

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        from mmw_geoprocessing_spark.functions import png_codec

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                g, v = d // GROUP_SIZE, d % 4
                frames = []
                for f in range(VKF_N_FRAMES):
                    scanlines = [
                        [_vpx(g, v, f, y, x) for x in range(IMG_W)]
                        for y in range(IMG_H)
                    ]
                    frames.append(png_codec.encode_png(scanlines, "L"))
                rows.append({"doc_id": d, "payload": _pack_container(frames)})
            yield pd.DataFrame(rows, columns=["doc_id", "payload"])

    return documents.select("doc_id").mapInPandas(
        encode, "doc_id long, payload binary"
    )


VKF_SCHEMA = (
    "doc_id long, frame_idx int, dhash_hex string, d0 int, d1 int, "
    "d2 int, d3 int"
)


def video_keyframes(media: DataFrame) -> DataFrame:
    """Parse each clip container, decode every keyframe with the REAL
    PNG decoder and dHash it (the image family's bit packing). One
    Arrow-batched ``mapInPandas`` emitting ``VKF_N_FRAMES`` rows per
    clip — parse, decode and hash never leave the executor."""

    def fp(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from mmw_geoprocessing_spark.functions import png_codec

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fi, frame in enumerate(_unpack_container(bytes(payload))):
                    w, h, mode, lines = png_codec.decode_png(frame)
                    if mode != "L" or (h, w) != (IMG_H, IMG_W):
                        raise NotImplementedError(
                            f"video_keyframes expects {IMG_H}x{IMG_W} grey "
                            f"frames; got {mode} {h}x{w} (resize via "
                            "multimodal.image_resize first)"
                        )
                    px = np.frombuffer(b"".join(lines), dtype=np.uint8).reshape(
                        h, w
                    ).astype(np.int64)
                    bits = (px[:, :-1] > px[:, 1:]).astype(np.int64).ravel()
                    d = [
                        int((bits[c * 16 : (c + 1) * 16] << np.arange(16)).sum())
                        for c in range(4)
                    ]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "frame_idx": fi,
                            "dhash_hex": "%04x%04x%04x%04x" % tuple(d),
                            "d0": d[0], "d1": d[1], "d2": d[2], "d3": d[3],
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "dhash_hex", "d0", "d1", "d2", "d3",
                ],
            )

    return media.mapInPandas(fp, VKF_SCHEMA)


def video_keyframe_fingerprints(documents: DataFrame) -> DataFrame:
    """Registry row: synthesize -> container-pack -> parse -> PNG
    decode -> per-keyframe dHash, the full binary round trip.
    Persisted per (session, corpus): the matcher reuses this table
    (the image family's index-at-ingest lesson)."""
    return _FP_CACHE.get_or_persist(
        documents, "video_keyframes", lambda d: video_keyframes(attach_video(d))
    )


def _vkf_cte() -> str:
    """The keyframe fingerprint table as a DuckDB CTE body: one
    closed-form SELECT per frame index (frame is a literal in every
    pixel expression), UNION ALL'd. PNG + the container are lossless,
    so this EQUALS the parse/decode path."""
    selects = []
    for f in range(VKF_N_FRAMES):
        dbits = [
            f"({_vpx_sql(f, y, x)}) > ({_vpx_sql(f, y, x + 1)})"
            for y in range(IMG_H)
            for x in range(IMG_W - 1)
        ]
        d0, d1, d2, d3 = _chunk_sql(dbits)
        selects.append(
            f"""
      SELECT doc_id, {f} AS frame_idx,
             CAST({d0} AS INT) AS d0, CAST({d1} AS INT) AS d1,
             CAST({d2} AS INT) AS d2, CAST({d3} AS INT) AS d3
      FROM documents"""
        )
    union = " UNION ALL ".join(selects)
    return f"""
    SELECT doc_id, frame_idx,
           printf('%04x%04x%04x%04x', d0, d1, d2, d3) AS dhash_hex,
           d0, d1, d2, d3
    FROM ({union})
    """


def video_keyframe_fingerprints_sql() -> str:
    return f"WITH vkf AS ({_vkf_cte()}) SELECT * FROM vkf"


def dedup_video_keyframe(documents: DataFrame) -> DataFrame:
    """Shared-keyframe video near-dup: candidates share (frame_idx,
    64-bit dHash), verified by the exact shared-frame count
    ``>= VKF_MATCH_T``. Output: ``(a_id, b_id, n_shared)`` with
    a_id < b_id (n_shared = VKF_N_FRAMES is the re-encoded exact dup,
    N-1 the one-keyframe edit).

    Plan shape: ONE shuffle — group the per-frame fingerprint rows by
    the bucket key, cap each bucket at its first ``VKF_BUCKET_CAP``
    members by doc_id, then enumerate each bucket's doc pairs JVM-side
    (``transform``/``slice`` over the sorted, capped doc list — the
    audio matcher's LSH-bucket enumeration, measured there 17.9 s →
    5.9 s vs the band self-join at the 100× replica)."""
    return _shared_frame_pairs(video_keyframe_fingerprints(documents))


def _shared_frame_pairs(fp: DataFrame) -> DataFrame:
    """The capped shared-frame matcher over ANY keyframe fingerprint
    table ``(doc_id, frame_idx, d0..d3)`` — factored out so the
    adversarial hot-bucket test can drive it without the texture."""
    buckets = (
        fp.groupBy("frame_idx", "d0", "d1", "d2", "d3")
        .agg(
            F.expr(f"slice(sort_array(collect_list(doc_id)), 1, {VKF_BUCKET_CAP})")
            .alias("ds")
        )
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
        .filter(F.col("n_shared") >= VKF_MATCH_T)
    )


def video_bucket_truncation_stats(documents: DataFrame) -> DataFrame:
    """The cap's visibility hook ("no silent caps"): one row per
    (frame_idx, dhash) bucket whose population exceeds
    ``VKF_BUCKET_CAP``. Empty (every tested scale) means the capped
    matcher equals the uncapped one."""
    fp = video_keyframe_fingerprints(documents)
    return (
        fp.groupBy("frame_idx", "d0", "d1", "d2", "d3")
        .agg(F.count(F.lit(1)).alias("population"))
        .filter(F.col("population") > VKF_BUCKET_CAP)
        .withColumn("kept", F.lit(VKF_BUCKET_CAP))
        .withColumn("discarded", F.col("population") - VKF_BUCKET_CAP)
    )


def dedup_video_keyframe_sql() -> str:
    return f"""
    WITH vkf AS ({_vkf_cte()}),
    capped AS (
      SELECT doc_id, frame_idx, d0, d1, d2, d3 FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY frame_idx, d0, d1, d2, d3 ORDER BY doc_id) AS rn
        FROM vkf
      ) WHERE rn <= {VKF_BUCKET_CAP}
    )
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(COUNT(*) AS INT) AS n_shared
    FROM capped a JOIN capped b
      ON a.frame_idx = b.frame_idx AND a.d0 = b.d0 AND a.d1 = b.d1
     AND a.d2 = b.d2 AND a.d3 = b.d3 AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {VKF_MATCH_T}
    """
