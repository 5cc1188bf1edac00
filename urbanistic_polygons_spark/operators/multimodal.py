"""Multimodal (binary media) column operators for the training-data
pipeline: typed metadata decode, resize planning, video frame sampling, and
feature extraction over opaque ``binary`` payload columns.

Spark-side design (the part that must be real at 100 TB):

- media payloads are an opaque ``BinaryType`` column + typed metadata; all
  decode/transform ops are Arrow-batched ``mapInPandas`` kernels that parse
  the raw bytes with numpy ``frombuffer``/reshape — NO per-row Python in
  the hot path (payloads are fixed-width here, so a batch parses as one
  (n, width) uint8 matrix).
- partitioning: media tables repartition by ``hash(media_ref)`` so decode
  fan-out is uniform; downstream joins back to documents are equi-joins on
  ``media_ref``.
- REAL codec decode (JPEG/PNG/audio) is STUBBED: the sandbox has no
  imaging/audio libraries, so :func:`decode_image_real` import-gates PIL
  and raises ``NotImplementedError`` with a clear message.  Everything
  around the stub — schema, batch shape, kernel signature, partitioning —
  is real and tested.

Determinism contract (DuckDB oracle): payloads are synthesized as
``unhex(md5(ref) || md5(ref||'1') || md5(ref||'2') || md5(ref||'3'))``
(64 bytes), so every derived value (width, height, frames, features) has a
closed-form hex-substring equivalent the oracle SQL reproduces exactly —
the Spark kernels parse the BYTES (the real plumbing), the oracle parses
the hex, and the values hash-match bit-for-bit.

Reference parity note: the reference has no media pipeline (it is an OSM
geometry engine); these operators are the north_star "interleaved text +
media documents" extension (BASELINE.json input_hint).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_BYTES = 64
FRAME_BYTES = 16
KINDS = ["image", "audio", "video"]


# ---------------------------------------------------------------------------
# Synthesis (deterministic stand-in for the blob store)
# ---------------------------------------------------------------------------

def media_table(spans: DataFrame) -> DataFrame:
    """(media_ref, kind, payload binary) for every media span.

    The payload is a deterministic 64-byte pseudo-blob derived from the
    ref (4 chained md5 digests) — the sandbox stand-in for fetching the
    object-store blob.  ``kind`` is re-derived from the ref hash so the
    table exercises all three media types.
    """
    refs = (spans.filter(F.col("media_ref") != "")
            .select("media_ref").distinct())
    hex_payload = F.concat(
        F.md5("media_ref"),
        F.md5(F.concat(F.col("media_ref"), F.lit("1"))),
        F.md5(F.concat(F.col("media_ref"), F.lit("2"))),
        F.md5(F.concat(F.col("media_ref"), F.lit("3"))))
    kind_idx = (F.conv(F.substring(F.md5("media_ref"), 1, 2), 16, 10)
                .cast("int") % 3 + 1)
    return refs.select(
        "media_ref",
        F.element_at(F.array(*[F.lit(k) for k in KINDS]), kind_idx).alias("kind"),
        F.unhex(hex_payload).alias("payload"),
    ).repartition("media_ref")


# ---------------------------------------------------------------------------
# Decode kernels (Arrow-batched, numpy byte parsing)
# ---------------------------------------------------------------------------

def _payload_matrix(payload: pd.Series) -> np.ndarray:
    """(n, PAYLOAD_BYTES) uint8 view of a batch of fixed-width payloads —
    one C-level concat, no per-row Python."""
    buf = b"".join(payload)
    return np.frombuffer(buf, np.uint8).reshape(-1, PAYLOAD_BYTES)


def decode_media_meta(media: DataFrame) -> DataFrame:
    """Parse typed metadata out of the binary payload header.

    Header layout of the synthetic SYN1 format (big-endian):
      bytes 0-1  width  seed -> width  = u16 % 1024 + 16
      bytes 2-3  height seed -> height = u16 % 1024 + 16
      byte  4    frame  seed -> n_frames (video) = u8 % 4 + 1
      bytes 5-6  rate   seed -> sample_rate (audio) = u16 % 32000 + 8000
    Non-applicable fields are 0 (width/height only for image+video,
    n_frames only for video, sample_rate only for audio).
    """
    def kernel(batches):
        for pdf in batches:
            m = _payload_matrix(pdf["payload"])
            u16 = lambda i: (m[:, i].astype(np.int64) << 8) | m[:, i + 1]  # noqa: E731
            width = u16(0) % 1024 + 16
            height = u16(2) % 1024 + 16
            n_frames = m[:, 4].astype(np.int64) % 4 + 1
            rate = u16(5) % 32000 + 8000
            kind = pdf["kind"].to_numpy()
            is_visual = (kind == "image") | (kind == "video")
            yield pd.DataFrame({
                "media_ref": pdf["media_ref"],
                "kind": pdf["kind"],
                "n_bytes": np.full(len(m), PAYLOAD_BYTES, np.int64),
                "width": np.where(is_visual, width, 0),
                "height": np.where(is_visual, height, 0),
                "n_frames": np.where(kind == "video", n_frames, 0),
                "sample_rate": np.where(kind == "audio", rate, 0),
            })
    return media.mapInPandas(
        kernel,
        "media_ref string, kind string, n_bytes long, width long, "
        "height long, n_frames long, sample_rate long")


def resize_plan(meta: DataFrame, target_w: int = 224,
                target_h: int = 224) -> DataFrame:
    """Integer resize plan for visual media (the transform the real decoder
    would execute): output dims + per-mille scale factors.  Pure column
    expressions — the plan is JVM-side; only pixel work needs a kernel."""
    visual = meta.filter(F.col("width") > 0)
    return visual.select(
        "media_ref", "kind", "width", "height",
        F.lit(target_w).alias("out_w"), F.lit(target_h).alias("out_h"),
        F.floor(F.lit(target_w * 1000) / F.col("width")).alias("scale_x_permille"),
        F.floor(F.lit(target_h * 1000) / F.col("height")).alias("scale_y_permille"),
    )


def frame_sample(media: DataFrame, stride: int = 2) -> DataFrame:
    """Sample every ``stride``-th fixed-width frame from video payloads:
    (media_ref, frame_idx, frame_hex).  The kernel slices the byte matrix —
    the real frame-extraction plumbing with the codec swapped for
    fixed-width frames."""
    def kernel(batches):
        n_frames_total = PAYLOAD_BYTES // FRAME_BYTES
        idxs = list(range(0, n_frames_total, stride))
        for pdf in batches:
            if not len(pdf):
                continue
            m = _payload_matrix(pdf["payload"])
            refs, frame_idx, frame_hex = [], [], []
            for j in idxs:
                fr = np.ascontiguousarray(
                    m[:, j * FRAME_BYTES:(j + 1) * FRAME_BYTES])
                # vectorized hex: one bulk .hex() then fixed-width split
                hexes = np.frombuffer(
                    fr.tobytes().hex().encode("ascii"),
                    dtype=f"S{2 * FRAME_BYTES}").astype("U32")
                refs.append(pdf["media_ref"].to_numpy())
                frame_idx.append(np.full(len(m), j, np.int64))
                frame_hex.append(hexes)
            yield pd.DataFrame({
                "media_ref": np.concatenate(refs),
                "frame_idx": np.concatenate(frame_idx),
                "frame_hex": np.concatenate(frame_hex),
            })
    return (media.filter(F.col("kind") == "video")
            .mapInPandas(kernel,
                         "media_ref string, frame_idx long, frame_hex string"))


def media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic integer feature vector from the payload (stand-in for
    an embedding model): feature j = big-endian u16 at byte offset 2j.
    Output exploded flat (media_ref, j, feat) for exact oracle hashing."""
    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = _payload_matrix(pdf["payload"])
            feats = ((m[:, 0:2 * dim:2].astype(np.int64) << 8)
                     | m[:, 1:2 * dim:2])
            n = len(m)
            yield pd.DataFrame({
                "media_ref": np.repeat(pdf["media_ref"].to_numpy(), dim),
                "j": np.tile(np.arange(dim, dtype=np.int64), n),
                "feat": feats.reshape(-1),
            })
    return media.mapInPandas(kernel, "media_ref string, j long, feat long")


# ---------------------------------------------------------------------------
# Real-decoder stub (import-gated)
# ---------------------------------------------------------------------------

def decode_image_real(media: DataFrame) -> DataFrame:
    """REAL image decode via PIL — STUB in this sandbox.

    The Spark plumbing (schema, Arrow batching, kernel signature) is
    identical to :func:`decode_media_meta`; only the byte->pixels step
    needs the imaging library, which this container does not ship.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - no PIL in sandbox
        raise NotImplementedError(
            "Real image decode requires Pillow, which is not available in "
            "this environment. Use decode_media_meta (synthetic SYN1 "
            "parser) for the pipeline plumbing; swap in this kernel when "
            "an imaging library is present.") from exc
    raise NotImplementedError("wire PIL decode kernel here")  # pragma: no cover
