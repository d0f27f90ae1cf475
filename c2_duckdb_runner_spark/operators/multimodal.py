"""Multimodal-column operators: opaque ``binary`` payloads + typed metadata.

The pattern a 100 TB multimodal training pipeline needs: media rides through
Spark as an opaque ``BinaryType`` column with a typed metadata struct, and
decode / feature-extract / frame-sample run as Arrow-batched pandas stages
(``mapInPandas``) so the bytes never take the row-at-a-time Python path.

The fixtures carry no real media, so payloads are synthesized
deterministically from ``documents.text`` (UTF-8 bytes) and the decoders are
STUBS: real ones would import PIL/librosa/av here — not available in this
container — so each stage computes a deterministic fake (byte-arithmetic
"dimensions", "RMS energy", "frame checksums") behind the same schema,
partitioning, and batch shape the real decoder would use. The arithmetic is
simple enough that DuckDB can replay it, giving these pandas-UDF stages full
differential oracles (rare for UDF code — and exactly why the fakes are
byte-sums, not library calls).

Reference reach: only via the delegated SQL slot (``main.cc:181-182``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c2_duckdb_runner_spark.registry import register
from c2_duckdb_runner_spark.tables import load, load_spread

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as an opaque binary payload + typed metadata struct.

    load_spread: decode-style pandas stages are the expensive map; spread
    them across cores despite the single-row-group fixture files."""
    return load_spread(spark, sf_dir, "documents", "doc_id").select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("modality"),
            F.lit("fake/v1").alias("codec"),
            F.length(F.encode("text", "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


@register(
    "mm_decode_image_stub",
    oracle="""
SELECT doc_id, 'image' AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST((octet_length(encode(text)) % 509) + 16 AS INTEGER) AS width,
       CAST((octet_length(encode(text)) % 353) + 16 AS INTEGER) AS height,
       CAST(((octet_length(encode(text)) % 509) + 16)
          * ((octet_length(encode(text)) % 353) + 16) AS BIGINT) AS n_pixels
FROM documents
""",
)
def mm_decode_image_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stage: binary payload → (width, height, n_pixels) via an
    Arrow-batched mapInPandas pass. One map-only stage; at 100 TB the decode
    cost dominates and parallelism is per input split, no shuffle."""
    # Metadata-struct fields are flattened JVM-side before the pandas stage:
    # the UDF only receives the columns the decoder actually touches, so the
    # Arrow transfer carries no struct and the field extraction stays in
    # codegen instead of a per-row Python dict access.
    src = _payloads(spark, sf_dir).select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.n_bytes").cast("bigint").alias("n_bytes"),
        "payload",
    )
    # Capture as a plain local: the closure must stay self-contained (no
    # module-global function refs) or cloudpickle pickles it by reference
    # and executors without this repo on sys.path can't deserialize it.
    has_pil = _HAS_PIL

    # Real-decode dispatch keys on the PAYLOAD (magic bytes), not on library
    # availability: installing Pillow must not change behavior for synthetic
    # payloads, and a real image payload without Pillow falls back to the
    # stub dimensions rather than failing the whole stage.
    image_magics = (b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF87a", b"GIF89a")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        def real_dims(payload: bytes):
            if payload is None or not has_pil \
                    or not payload.startswith(image_magics):
                return None
            try:
                from PIL import Image

                with Image.open(io.BytesIO(payload)) as img:
                    return img.size  # (width, height)
            except Exception:
                return None  # corrupt/unsupported → stub path

        for pdf in batches:
            # A real decoder is per-payload; the stub's "dimensions" need
            # only the byte length, so compute them vectorized over the
            # whole Arrow batch, then overwrite the (rare at fixture scale,
            # dominant in production) rows whose payloads actually decode.
            # nullable Int64: a NULL payload (hostile fixture) yields NULL
            # dimensions, matching the oracle's NULL octet_length chain
            n = pdf["payload"].map(
                lambda b: None if b is None else len(b)
            ).astype("Int64")
            width = (n % 509 + 16).astype("Int32")
            height = (n % 353 + 16).astype("Int32")
            if has_pil:
                for i, payload in enumerate(pdf["payload"]):
                    dims = real_dims(
                        None if payload is None else bytes(payload)
                    )
                    if dims is not None:
                        width.iloc[i], height.iloc[i] = dims
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["n_bytes"],
                    "width": width,
                    "height": height,
                    "n_pixels": (width.astype("Int64")
                                 * height.astype("Int64")),
                }
            )

    return src.mapInPandas(
        decode,
        schema=(
            "doc_id bigint, modality string, n_bytes bigint, "
            "width int, height int, n_pixels bigint"
        ),
    )


@register(
    "mm_audio_rms_stub",
    # exact integer ppm with half-up rounding: floor((2*s*1e6 + d)/(2d)).
    # The original ROUND(double, 6) diverged at the 100x replica — mean
    # byte values are k/(255n) rationals that can land EXACTLY on a
    # 6-decimal half (….3421875), where Python's round (half-even, the
    # mapInPandas side) and DuckDB's ROUND (half-away) pick different
    # neighbors; invisible until the replica's suffixed bytes produced
    # tie rows. Integer arithmetic has one rounding rule on both engines.
    # The payload is BYTES: the oracle sums UTF-8 octets parsed from
    # hex(encode(text)) two chars at a time. The previous ord(text[i])
    # spelling indexed CODEPOINTS — identical on the all-ASCII fixture,
    # wrong on hostile non-ASCII text (caught by the r11 hostile sweep).
    # NULL/empty payloads yield NULL (the ÷0 guard both engines honor).
    oracle="""
WITH b AS (
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN n > 0 THEN
         (2 * list_sum([CAST('0x' || substr(h, 2*i - 1, 2) AS BIGINT)
                        FOR i IN range(1, n + 1)]) * 1000000
          + n * 255) // (2 * n * 255) END AS BIGINT) AS rms_ppm
FROM b
""",
)
def mm_audio_rms_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extract stage (STUB): "RMS energy" = mean byte value / 255.
    Real impl would be librosa.feature.rms over decoded samples; the vector
    arithmetic happens batch-wise in numpy, the shape a real extractor uses."""
    src = _payloads(spark, sf_dir)

    def rms(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            vals = []
            for p in pdf["payload"]:
                if p is None or len(p) == 0:
                    vals.append(None)  # NULL/empty payload -> NULL energy
                    continue
                a = np.frombuffer(p, dtype=np.uint8)
                s, d = int(a.sum()), len(a) * 255
                # exact int ppm, half-up — matches the oracle bit-for-bit
                vals.append((2 * s * 1_000_000 + d) // (2 * d))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "rms_ppm": pd.array(vals, dtype="Int64"),
            })

    return src.mapInPandas(rms, schema="doc_id bigint, rms_ppm bigint")


_N_FRAMES, _FRAME_LEN = 4, 16


@register(
    "mm_frame_sample_stub",
    # Byte-level frames: offsets and checksums over UTF-8 OCTETS (hex-pair
    # parsing), not codepoints — same hostile-sweep fix as mm_audio_rms_stub
    oracle=f"""
WITH f AS (
  SELECT doc_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n,
         unnest(range(0, {_N_FRAMES})) AS frame_idx
  FROM documents
)
SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(list_sum([CAST('0x' || substr(h, 2*i - 1, 2) AS BIGINT)
                      FOR i IN range(frame_idx * {_FRAME_LEN} + 1,
                                     frame_idx * {_FRAME_LEN} + {_FRAME_LEN} + 1)])
            % 256 AS INTEGER) AS checksum
FROM f
WHERE n >= (frame_idx + 1) * {_FRAME_LEN}
""",
)
def mm_frame_sample_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample stage (STUB): take 4 fixed-offset 16-byte "frames" per
    payload, emit per-frame checksums — a row-expanding mapInPandas (one
    input row → up to 4 output rows), the shape real video frame sampling
    uses. Real impl: av.open(...).decode(video=0) at sampled PTS."""
    src = _payloads(spark, sf_dir)

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None:  # NULL payload -> no frames (oracle's
                    continue   # NULL-length WHERE excludes them)
                for k in range(_N_FRAMES):
                    chunk = bytes(p[k * _FRAME_LEN : (k + 1) * _FRAME_LEN])
                    if len(chunk) == _FRAME_LEN:
                        ids.append(doc_id)
                        idxs.append(k)
                        sums.append(sum(chunk) % 256)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "checksum": sums}
            )

    return src.mapInPandas(
        sample, schema="doc_id bigint, frame_idx int, checksum int"
    )


@register(
    "mm_resize_plan_stub",
    oracle="""
SELECT doc_id,
       CAST((octet_length(encode(text)) % 509) + 16 AS INTEGER) AS width,
       CAST((octet_length(encode(text)) % 353) + 16 AS INTEGER) AS height,
       CAST(least((octet_length(encode(text)) % 509) + 16, 224) AS INTEGER)
         AS out_width,
       CAST(least((octet_length(encode(text)) % 353) + 16, 224) AS INTEGER)
         AS out_height
FROM documents
""",
)
def mm_resize_plan_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage (STUB): plan target dims (cap at 224px, the usual vision
    model input) from decoded dims. Kept as pure JVM expressions — resizing
    *metadata* never needs Python; only the pixel work (stubbed away) does."""
    src = _payloads(spark, sf_dir)
    w = (F.col("meta.n_bytes") % 509 + 16).cast("int")
    h = (F.col("meta.n_bytes") % 353 + 16).cast("int")
    return src.select(
        "doc_id",
        w.alias("width"),
        h.alias("height"),
        F.least(w, F.lit(224)).alias("out_width"),
        F.least(h, F.lit(224)).alias("out_height"),
    )
