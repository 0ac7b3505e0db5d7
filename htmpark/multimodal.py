"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB multimodal tables: media lives as an opaque ``binary``
column next to typed metadata (mime, width/height, duration), processed by
Arrow-batched ``mapInPandas`` stages.  The Spark-side plumbing here (schema,
batch iteration, partition sizing) is real and tested; the *codec* step is
STUBBED because no image/audio libraries exist in this container:

* decode_image / decode_audio raise NotImplementedError unless
  ``fake=True``, which substitutes a deterministic fake decoder so the
  downstream plumbing (resize, frame-sample) is exercisable in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

IMAGE_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"GIF8": "image/gif",
}


def sniff_mime(payload: bytes) -> str:
    for magic, mime in IMAGE_MAGIC.items():
        if payload[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


def decode_image(payload: bytes, fake: bool = False):
    """Decode an image payload to (height, width, channels) + pixel summary.

    STUB: real decoding needs an imaging library not present in this
    container.  ``fake=True`` returns a deterministic pseudo-decode derived
    from the bytes so batch plumbing is testable.
    """
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library (not in container); "
            "pass fake=True for the deterministic test decoder"
        )
    n = len(payload)
    h = (n % 480) + 1
    w = (n % 640) + 1
    checksum = sum(payload[:256]) % 65536
    return {"height": h, "width": w, "channels": 3, "pix_checksum": checksum}


def decode_audio(payload: bytes, fake: bool = False):
    """STUB audio decode -> (n_samples, sample_rate)."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires an audio library (not in container); "
            "pass fake=True for the deterministic test decoder"
        )
    return {"n_samples": len(payload) // 2, "sample_rate": 16000}


def frame_sample_indices(n_frames: int, k: int) -> list[int]:
    """Deterministic uniform frame sampling (video path)."""
    if n_frames <= 0 or k <= 0:
        return []
    if k >= n_frames:
        return list(range(n_frames))
    return [(i * n_frames) // k for i in range(k)]


def image_meta_stage(df: DataFrame, payload_col: str = "payload",
                     fake: bool = True) -> DataFrame:
    """mapInPandas stage: binary payloads -> typed image metadata rows.

    Real Spark plumbing (Arrow batches, explicit output schema); the decode
    inside is the stub above.
    """
    import pandas as pd

    other = [c for c in df.columns if c != payload_col]

    def run(batches):
        for pdf in batches:
            pays = pdf[payload_col]
            metas = [decode_image(bytes(p), fake=fake) for p in pays]
            out = {c: pdf[c] for c in other}
            out["mime"] = [sniff_mime(bytes(p)) for p in pays]
            out["height"] = pd.array([m["height"] for m in metas], dtype="int32")
            out["width"] = pd.array([m["width"] for m in metas], dtype="int32")
            out["pix_checksum"] = pd.array([m["pix_checksum"] for m in metas], dtype="int32")
            yield pd.DataFrame(out)

    schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in other]
        + ["mime string", "height int", "width int", "pix_checksum int"]
    )
    return df.mapInPandas(run, schema)


def resize_stage(df: DataFrame, target_h: int = 224, target_w: int = 224,
                 payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """mapInPandas stage: decode -> resize to (target_h, target_w).

    Real plumbing (Arrow batches, fixed output schema, stateless map — at
    100 TB this fuses with the scan and never shuffles); the pixel work is
    the deterministic fake (resized checksum = stride-sampled byte sum),
    since no imaging library exists in this container.  The aspect-ratio
    metadata (scale numerator/denominator as exact ints) is the part a
    real resizer would also emit."""
    import pandas as pd

    other = [c for c in df.columns if c != payload_col]

    def run(batches):
        for pdf in batches:
            pays = [bytes(p) for p in pdf[payload_col]]
            metas = [decode_image(p, fake=fake) for p in pays]
            stride = [max(1, m["height"] * m["width"] // (target_h * target_w))
                      for m in metas]
            out = {c: pdf[c] for c in other}
            out["rh"] = pd.array([target_h] * len(pays), dtype="int32")
            out["rw"] = pd.array([target_w] * len(pays), dtype="int32")
            out["scale_num"] = pd.array([m["height"] for m in metas], dtype="int32")
            out["scale_den"] = pd.array([target_h] * len(pays), dtype="int32")
            out["resized_checksum"] = pd.array(
                [sum(p[::s]) % 65536 for p, s in zip(pays, stride)],
                dtype="int32")
            yield pd.DataFrame(out)

    schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in other]
        + ["rh int", "rw int", "scale_num int", "scale_den int",
           "resized_checksum int"])
    return df.mapInPandas(run, schema)


def feature_stage(df: DataFrame, n_buckets: int = 8,
                  payload_col: str = "payload", fake: bool = True) -> DataFrame:
    """mapInPandas stage: payload -> fixed-dim feature vector
    (``array<int>`` byte-histogram buckets as the deterministic fake of an
    embedding model).  The schema/batch shape is exactly what a real
    encoder stage emits (fixed-width vector per row, stateless map); swap
    the fake for a model call and nothing else changes.  Integer features
    keep any downstream comparison engine-exact."""
    import pandas as pd

    if not fake:
        raise NotImplementedError(
            "feature extraction requires a vision/audio model (not in "
            "container); pass fake=True for the deterministic histogram")
    other = [c for c in df.columns if c != payload_col]

    def run(batches):
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                p = bytes(p)
                h = [0] * n_buckets
                for b in p:
                    h[b * n_buckets // 256] += 1
                feats.append(h)
            out = {c: pdf[c] for c in other}
            out["features"] = feats
            yield pd.DataFrame(out)

    schema = ", ".join([f"{c} {dict(df.dtypes)[c]}" for c in other]
                       + ["features array<int>"])
    return df.mapInPandas(run, schema)
