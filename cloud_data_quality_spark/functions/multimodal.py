"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque `binary` columns with typed metadata (the pages table
carries `html:binary`). The Spark-side plumbing — schema, partition-preserving
mapInPandas stages, Arrow batch shapes, bounded batch sizes for large blobs —
is real and tested; the codec step is stubbed because this container ships no
image/audio libraries (Pillow/librosa/av). Each stub either raises
NotImplementedError (strict mode) or emits a deterministic fake derived from
the bytes (test mode), clearly flagged.

At scale the rules are: (1) never collect blobs; (2) bound
spark.sql.execution.arrow.maxRecordsPerBatch so a batch of blobs fits in the
Python worker (session factory sets 2048; drop to ~64 for multi-MB media);
(3) decode inside mapInPandas so the blob never round-trips.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = ("width int, height int, channels int, format string, "
                     "content_sha256 string")


def _try_import_pillow():
    try:
        from PIL import Image  # noqa: F401
        return Image
    except ImportError:
        return None


def image_metadata(df: DataFrame, blob_col: str = "html",
                   deterministic_fake: bool = True) -> DataFrame:
    """Per-blob metadata via mapInPandas. With a real codec available it
    decodes headers; otherwise (this container) emits a deterministic fake
    from the byte content so downstream plumbing stays testable."""
    pillow = _try_import_pillow()
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [IMAGE_META_SCHEMA]
    )

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        for pdf in batches:
            metas = {"width": [], "height": [], "channels": [],
                     "format": [], "content_sha256": []}
            for blob in pdf[blob_col]:
                if blob is None:
                    for k in metas:
                        metas[k].append(None)
                    continue
                digest = hashlib.sha256(bytes(blob)).hexdigest()
                if pillow is not None:
                    try:
                        img = pillow.open(io.BytesIO(bytes(blob)))
                        metas["width"].append(img.width)
                        metas["height"].append(img.height)
                        metas["channels"].append(len(img.getbands()))
                        metas["format"].append(img.format or "UNKNOWN")
                    except Exception:
                        metas["width"].append(None); metas["height"].append(None)
                        metas["channels"].append(None); metas["format"].append("INVALID")
                elif deterministic_fake:
                    # STUB: no codec in container — fake dims derived from the
                    # digest so values are stable for tests
                    metas["width"].append(int(digest[:4], 16) % 4096)
                    metas["height"].append(int(digest[4:8], 16) % 4096)
                    metas["channels"].append(3)
                    metas["format"].append("FAKE")
                else:
                    raise NotImplementedError(
                        "image decode requires Pillow; not available in this "
                        "container — run with deterministic_fake=True")
                metas["content_sha256"].append(digest)
            yield pdf.assign(**metas)

    return df.mapInPandas(stage, schema=out_schema)


def frame_sample_stub(df: DataFrame, blob_col: str = "html",
                      every_n_bytes: int = 4096) -> DataFrame:
    """Video frame-sampling stand-in: emits one row per sampled offset with a
    digest of the window — the explode/repartition shape of real frame
    extraction without a codec. Schema: (orig cols…, frame_no int,
    frame_sha256 string)."""
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["frame_no int", "frame_sha256 string"]
    )

    def stage(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                blob = row[blob_col]
                if blob is None:
                    continue
                b = bytes(blob)
                for frame_no, off in enumerate(range(0, max(len(b), 1),
                                                     every_n_bytes)):
                    rows.append({**row.to_dict(), "frame_no": frame_no,
                                 "frame_sha256": hashlib.sha256(
                                     b[off:off + every_n_bytes]).hexdigest()})
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=list(pdf.columns) + ["frame_no", "frame_sha256"])

    return df.mapInPandas(stage, schema=out_schema)
