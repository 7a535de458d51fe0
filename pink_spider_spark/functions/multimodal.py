"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as binary columns; the Spark-side
plumbing here — schemas, Arrow batch shapes, mapInPandas signatures,
partition behaviour — is real and tested.  The codec layer is pluggable:
real decoders (PIL / soundfile / av) are used when importable, otherwise a
clearly-marked deterministic FAKE container format stands in (this sandbox
ships no media libraries; see ``_HAVE_PIL``).

Fake container layout (deterministic, self-describing):
    magic    8 bytes   b"FAKEIMG1" | b"FAKEAUD1" | b"FAKEVID1"
    width    4 bytes   big-endian u32   (images/video)
    height   4 bytes   big-endian u32   (images/video)
    frames   4 bytes   big-endian u32   (audio: samples/1000, video: frames)
    payload  N bytes   pseudo-random pixels derived from the header
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

try:  # real codec path — not present in this container
    import PIL.Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),     # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("data", T.BinaryType(), True),
])

META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("n_bytes", T.LongType(), False),
])

FEATURE_DIM = 16

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("embedding", T.ArrayType(T.FloatType()), False),
])

_MAGICS = {"image": b"FAKEIMG1", "audio": b"FAKEAUD1", "video": b"FAKEVID1"}


# ------------------------------------------------------------ fake codec
def encode_fake(kind: str, width: int, height: int, frames: int) -> bytes:
    header = _MAGICS[kind] + struct.pack(">III", width, height, frames)
    payload = hashlib.sha256(header).digest() * 4
    return header + payload


def decode_header(data: bytes):
    """Parse the container header: the deterministic fake format always,
    and — when PIL is importable — real image bytes too (capability
    detection at import, ``_HAVE_PIL``).  Undecodable bytes return None
    (the metadata row carries only n_bytes), never raise: at 100 TB a
    corrupt blob must not kill the task."""
    if data is None or len(data) < 20:
        return None
    magic, rest = bytes(data[:8]), bytes(data[8:20])
    kind = {v: k for k, v in _MAGICS.items()}.get(magic)
    if kind is None:
        if _HAVE_PIL:  # pragma: no cover - exercised where PIL exists
            import io

            import PIL.Image

            try:
                with PIL.Image.open(io.BytesIO(bytes(data))) as img:
                    return ("image", int(img.width), int(img.height),
                            int(getattr(img, "n_frames", 1)))
            except Exception:
                return None
        return None
    width, height, frames = struct.unpack(">III", rest)
    return kind, width, height, frames


# -------------------------------------------------------------- operators
def decode_meta(media: DataFrame) -> DataFrame:
    """Binary -> typed metadata, one Arrow pass (mapInPandas)."""
    from .udfs import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, data in zip(pdf["media_id"], pdf["kind"], pdf["data"]):
                hdr = decode_header(data)
                if hdr is None:
                    rows.append({"media_id": mid, "kind": kind, "width": None,
                                 "height": None, "n_frames": None,
                                 "n_bytes": len(data or b"")})
                else:
                    k, w, h, fr = hdr
                    rows.append({"media_id": mid, "kind": k, "width": w,
                                 "height": h, "n_frames": fr,
                                 "n_bytes": len(data)})
            yield pd.DataFrame(rows, columns=[f.name for f in META_SCHEMA.fields])

    return media.mapInPandas(run, schema=META_SCHEMA)


def resize_images(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize: real impl = PIL thumbnail; fake path rewrites the
    header with the scaled dimensions (aspect preserved, deterministic)."""
    from .udfs import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, mime, data in zip(pdf["media_id"], pdf["kind"],
                                             pdf["mime"], pdf["data"]):
                hdr = decode_header(data)
                if hdr is None or hdr[0] != "image":
                    rows.append({"media_id": mid, "kind": kind, "mime": mime,
                                 "data": data})
                    continue
                _k, w, h, fr = hdr
                is_fake = bytes(data[:8]) in _MAGICS.values()
                if _HAVE_PIL and not is_fake:  # pragma: no cover - real path
                    import io

                    import PIL.Image

                    with PIL.Image.open(io.BytesIO(bytes(data))) as img:
                        img.thumbnail((max_side, max_side))
                        buf = io.BytesIO()
                        img.save(buf, format="PNG")
                    rows.append({"media_id": mid, "kind": kind,
                                 "mime": "image/png", "data": buf.getvalue()})
                    continue
                scale = min(1.0, max_side / max(w, h, 1))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                rows.append({"media_id": mid, "kind": kind, "mime": mime,
                             "data": encode_fake("image", nw, nh, fr)})
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: emits (media_id, frame_index) rows; real impl
    decodes with av/ffmpeg, fake path enumerates the header's frame count."""
    from .udfs import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)
    out_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
    ])

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                hdr = decode_header(data)
                if hdr is None or hdr[0] != "video":
                    continue
                for i in range(0, hdr[3], every_n):
                    rows.append({"media_id": mid, "frame_index": i})
            yield pd.DataFrame(rows, columns=["media_id", "frame_index"])

    return media.mapInPandas(run, schema=out_schema)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Content-hash feature embedding (deterministic stand-in for a model
    forward pass); output feeds the similarity operators unchanged."""
    from .udfs import ensure_package_shipped

    ensure_package_shipped(media.sparkSession)

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                h = hashlib.sha256(bytes(data or b"")).digest()
                vec = [(int.from_bytes(h[2 * i:2 * i + 2], "big") / 65535.0) * 2 - 1
                       for i in range(dim)]
                rows.append({"media_id": mid, "embedding": vec})
            yield pd.DataFrame(rows, columns=["media_id", "embedding"])

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------- synth
def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table, so the
    decode pipeline has a closed-form DuckDB oracle: kind cycles by
    doc_id % 3, width = 64 + (doc_id % 8) * 32, height = 64 +
    (doc_id % 5) * 24, frames = 1 + doc_id % 40."""
    from .udfs import ensure_package_shipped

    ensure_package_shipped(docs.sparkSession)

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                kind = ("image", "audio", "video")[did % 3]
                w = 64 + (did % 8) * 32
                h = 64 + (did % 5) * 24
                fr = 1 + did % 40
                rows.append({"media_id": did, "kind": kind,
                             "mime": f"x-fake/{kind}",
                             "data": encode_fake(kind, w, h, fr)})
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return docs.select("doc_id").mapInPandas(gen, schema=MEDIA_SCHEMA)
