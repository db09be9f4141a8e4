"""Multimodal column processing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing here is real and tested — schemas, batch shapes,
partition sizing, UDF signatures. The actual media decoding is STUBBED
(``pillow``/``librosa``/``av`` are not in this container): decoders raise
``NotImplementedError`` unless the deterministic fake is requested, which
derives pseudo-content from the binary payload so pipelines can be tested
end-to-end without media libs.

Scale notes:
- Binary payloads ride in the same parquet as metadata; Spark's vectorized
  reader handles them, and ``spark.sql.files.maxPartitionBytes`` bounds the
  per-task byte budget (media rows are big — size partitions by bytes, not
  rows).
- ``mapInPandas`` streams Arrow record batches: peak memory per task is one
  batch, not one partition. Keep ``spark.sql.execution.arrow
  .maxRecordsPerBatch`` modest (e.g. 64) for multi-MB payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: media row schema: binary payload + typed metadata
MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, mime string, "
    "width int, height int, duration_ms bigint"
)

IMAGE_FEATURE_SCHEMA = (
    "media_id bigint, width int, height int, n_bytes bigint, "
    "mean_luma double, phash bigint"
)

FRAME_SAMPLE_SCHEMA = "media_id bigint, frame_idx int, frame_ts_ms bigint, frame binary"


def _fake_decode(payload: bytes) -> dict:
    """Deterministic pseudo-decode derived from the payload bytes.

    Stands in for a real image decode so batch shapes, schemas, and
    downstream aggregations are exercised honestly.
    """
    n = len(payload)
    checksum = sum(payload[:1024]) if n else 0
    return {
        "width": 16 + checksum % 64,
        "height": 16 + (checksum // 64) % 64,
        "mean_luma": (checksum % 256) / 255.0,
        "phash": int.from_bytes(payload[:8].ljust(8, b"\0"), "big") >> 1,
    }


def extract_image_features(media: DataFrame, use_fake_decoder: bool = False) -> DataFrame:
    """Per-image features via Arrow-batched mapInPandas.

    With ``use_fake_decoder=False`` this raises ``NotImplementedError`` at
    execution time — the real decoder plugs in here (PIL.Image.open over
    ``io.BytesIO(payload)``), with zero changes to the Spark plumbing.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not use_fake_decoder:
                    raise NotImplementedError(
                        "image decoding requires pillow; pass use_fake_decoder=True "
                        "for the deterministic test double"
                    )
                d = _fake_decode(bytes(payload or b""))
                rows.append(
                    (
                        int(mid),
                        d["width"],
                        d["height"],
                        len(payload or b""),
                        d["mean_luma"],
                        d["phash"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_bytes",
                    "mean_luma",
                    "phash",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_ms: int = 1000, use_fake_decoder: bool = False
) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame.

    Demonstrates the 1→N batch shape (each input row yields a variable
    number of output rows) that real frame extraction needs.
    """
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if not use_fake_decoder:
                    raise NotImplementedError(
                        "video decoding requires pyav; pass use_fake_decoder=True"
                    )
                payload = bytes(payload or b"")
                n_frames = max(1, int((dur or 0) // every_ms))
                for i in range(n_frames):
                    ts = i * every_ms
                    fake_frame = payload[i % max(len(payload), 1) :][:16]
                    out.append((int(mid), i, ts, fake_frame))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_ts_ms", "frame"]
            )

    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        run, schema=FRAME_SAMPLE_SCHEMA
    )


RESIZED_SCHEMA = (
    "media_id bigint, out_width int, out_height int, resized binary, "
    "n_bytes_in bigint, n_bytes_out bigint"
)


def resize_images(
    media: DataFrame,
    out_width: int = 224,
    out_height: int = 224,
    use_fake_decoder: bool = False,
) -> DataFrame:
    """Batch image resize (decode → resize → re-encode) via mapInPandas.

    The 1→1 payload-transform shape: output rows carry a new binary column
    whose size differs from the input (the part that matters for partition
    sizing — plan output partitions by expected OUTPUT bytes when the
    resize shrinks 10×). The real path plugs PIL's ``Image.resize`` in;
    the deterministic fake derives a pseudo-thumbnail by strided byte
    sampling so sizes/schemas/batch shapes are exercised honestly.
    """
    import pandas as pd

    target = max(1, (out_width * out_height) // 8)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if not use_fake_decoder:
                    raise NotImplementedError(
                        "image decoding requires pillow; pass "
                        "use_fake_decoder=True for the deterministic test double"
                    )
                payload = bytes(payload or b"")
                stride = max(1, len(payload) // target)
                resized = payload[::stride][:target]
                rows.append(
                    (
                        int(mid),
                        out_width,
                        out_height,
                        resized,
                        len(payload),
                        len(resized),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "out_width",
                    "out_height",
                    "resized",
                    "n_bytes_in",
                    "n_bytes_out",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata rollup (no decode): byte/row counts per kind."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
            F.avg("duration_ms").alias("avg_duration_ms"),
        )
        .orderBy("kind")
    )
