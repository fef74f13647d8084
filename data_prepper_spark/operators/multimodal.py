"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct.
The Spark-side plumbing (schema, Arrow batching via mapInPandas, bounded
batch sizes for multi-MB payloads) is real and tested; the actual codec
work (image decode, resample, frame extraction) is stubbed because codec
libraries are not in this environment — each stub either raises
NotImplementedError or applies a clearly-marked deterministic fake.

At scale: payloads should be read with ``spark.read.format("binaryFile")``
or from parquet binary columns; keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` low (sized so batch_bytes
~ tens of MB) so Arrow batches bound executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "id long, n_bytes long, md5 string, modality string"


def attach_binary(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Test rig: derive a deterministic binary payload column from text."""
    return df.select(
        F.col(id_col).alias("id"), F.encode(F.col(text_col), "UTF-8").alias("payload")
    )


def extract_metadata(df: DataFrame, payload_col: str = "payload", modality: str = "image") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads.

    This is the pattern every decode/feature step follows: mapInPandas over
    (id, payload), vectorized work per batch, typed output schema.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = b[payload_col]
            yield pd.DataFrame(
                {
                    "id": b["id"],
                    "n_bytes": payloads.map(len),
                    "md5": payloads.map(lambda x: hashlib.md5(bytes(x)).hexdigest()),
                    "modality": modality,
                }
            )

    return df.mapInPandas(run, META_SCHEMA)


def _have_pillow() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def decode_image(df: DataFrame, payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """Image decode -> (id, width, height, mean_luma).

    With ``fake=True`` produces a deterministic fake (dimensions derived
    from payload bytes) so downstream plumbing is testable without codec
    libraries. With ``fake=False`` the REAL decode runs via Pillow when
    importable on the executors (r5: optional-dep activation — provision
    Pillow on the cluster and this path lights up with no code change);
    if Pillow is absent it raises the capability NotImplementedError.
    Undecodable payloads yield null columns (per-row failure tagging,
    like the reference's processors) rather than failing the batch.
    """
    if not fake:
        if not _have_pillow():
            raise NotImplementedError(
                "image decoding requires Pillow (or opencv) on executors: "
                "pip install pillow"
            )

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import io

            from PIL import Image

            def one(x):
                try:
                    im = Image.open(io.BytesIO(bytes(x)))
                    g = im.convert("L")
                    px = g.resize((16, 16)).getdata()  # bounded luma sample
                    return im.width, im.height, sum(px) / len(px)
                except Exception:
                    return None, None, None

            for b in batches:
                w, h, luma = [], [], []
                for x in b[payload_col]:
                    a, c, d = one(x)
                    w.append(a), h.append(c), luma.append(d)
                yield pd.DataFrame(
                    {"id": b["id"], "width": w, "height": h, "mean_luma": luma}
                )

        return df.mapInPandas(run_real, "id long, width int, height int, mean_luma double")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            p = b[payload_col]
            yield pd.DataFrame(
                {
                    "id": b["id"],
                    # DETERMINISTIC FAKE: stands in for real decode
                    "width": p.map(lambda x: 16 + len(x) % 1024),
                    "height": p.map(lambda x: 16 + (len(x) * 7) % 1024),
                    "mean_luma": p.map(lambda x: (sum(x[:64]) / max(1, len(x[:64]))) if len(x) else 0.0),
                }
            )

    return df.mapInPandas(run, "id long, width int, height int, mean_luma double")


def sample_frames(df: DataFrame, payload_col: str = "payload", every_n: int = 10, fake: bool = True) -> DataFrame:
    """STUB: video frame sampling -> one row per sampled frame offset."""
    if not fake:
        raise NotImplementedError("video demux requires pyav/ffmpeg on executors")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i, x in zip(b["id"], b[payload_col]):
                n_frames = max(1, len(x) // 256)  # DETERMINISTIC FAKE
                rows.extend((int(i), f) for f in range(0, n_frames, every_n))
            yield pd.DataFrame(rows, columns=["id", "frame_idx"]) if rows else pd.DataFrame(
                {"id": pd.Series(dtype="int64"), "frame_idx": pd.Series(dtype="int64")}
            )

    return df.mapInPandas(run, "id long, frame_idx long")
