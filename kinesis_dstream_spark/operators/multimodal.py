"""Multimodal-column operators (SURVEY §2B E-13).

Images/audio/video are opaque ``binary`` payload columns + typed metadata
structs. The Spark-side plumbing (schemas, content addressing, Arrow
batch shape through mapInPandas) is real and tested; the actual
image/audio decode is stubbed behind an import-gate because the codec
libraries are not in this container — the stub produces a deterministic
fake so the pipeline shape is verifiable end-to-end.

Scale notes: payloads ride along as binary column values; decode /
feature-extract runs in ``mapInPandas`` so each Arrow batch is touched
once with zero per-row Python overhead beyond the batch loop. Content-
addressed dedup happens on the 32-byte sha2 key, never on payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def to_media_table(documents: DataFrame) -> DataFrame:
    """Build a media-shaped table from documents: binary payload + metadata.

    The fixture has no real media, so the payload is the utf-8 encoding
    of the text — which exercises exactly the same column plumbing
    (BinaryType values, length/hash expressions, struct metadata).
    """
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.col("source").alias("origin"),
            F.col("lang").alias("lang"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def media_content_index(documents: DataFrame) -> DataFrame:
    """Content-addressed index: sha256 + byte length per payload, flattened.

    The flat projection (not the struct) is what downstream joins and the
    oracle check consume; hashing runs on the binary payload JVM-side.
    """
    media = to_media_table(documents)
    return media.select(
        "media_id",
        F.sha2(F.col("payload"), 256).alias("content_sha"),
        F.octet_length(F.col("payload")).alias("n_bytes"),
        F.col("meta.origin").alias("origin"),
        F.col("meta.mime").alias("mime"),
    )


def media_dedup_by_content(documents: DataFrame) -> DataFrame:
    """Content-addressed dedup over the media table (E-13 + E-10)."""
    idx = media_content_index(documents)
    return (
        idx.groupBy("content_sha")
        .agg(
            F.min("media_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.min("n_bytes").alias("n_bytes"),
        )
        .select("keep_id", "content_sha", "n_copies", "n_bytes")
    )


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("decoder", StringType()),
    ]
)


def _decode_payload(payload: bytes) -> tuple[int, int, int, str]:
    """Decode one media payload → (width, height, channels, decoder).

    Real decode requires PIL/libav, absent from this container; the
    deterministic fake derives dimensions from the payload bytes so
    results are stable and testable. The import-gate makes the real path
    a drop-in once the codec libs exist.
    """
    try:  # pragma: no cover - codec libs not installed in this container
        from PIL import Image  # noqa: F401
        import io

        with Image.open(io.BytesIO(payload)) as im:
            return im.width, im.height, len(im.getbands()), "pillow"
    except Exception:
        # Deterministic fake: dimensions from payload length + first bytes.
        n = len(payload)
        w = 64 + (payload[0] if n else 0)
        h = 64 + (payload[-1] if n else 0)
        return w, h, 3, "fake"


def decode_media_batch(media: DataFrame) -> DataFrame:
    """mapInPandas decode: one Arrow batch in, one metadata batch out.

    The UDF iterates pandas batches (never rows-at-a-time through pickle);
    payload bytes stay inside the batch. Swap ``_decode_payload`` for a
    real codec and nothing else changes.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_decode_payload(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                    "decoder": [d[3] for d in dims],
                }
            )
            yield out

    return media.mapInPandas(decode, DECODED_SCHEMA)


def media_decode_stats(documents: DataFrame) -> DataFrame:
    """Decode the media table and aggregate shape stats (rows-only check)."""
    decoded = decode_media_batch(to_media_table(documents))
    return (
        decoded.groupBy("decoder", "channels")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("width"), 4).alias("avg_width"),
            F.round(F.avg("height"), 4).alias("avg_height"),
        )
    )


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_payload", BinaryType()),
        StructField("frame_sha", StringType()),
    ]
)


def sample_frames(media: DataFrame, every_n_bytes: int = 256, max_frames: int = 8) -> DataFrame:
    """Frame sampling (video-shaped workload): 1 row in, N frame rows out.

    Real frame extraction needs libav (absent here); the deterministic
    stand-in slices the payload every ``every_n_bytes`` — which exercises
    the actual engineering surface: a fan-out mapInPandas whose output
    batch is larger than its input batch, with binary payload slices and
    per-frame content hashes. Swap the slicer for an av.decode loop and
    the plumbing is unchanged.
    """
    import hashlib

    def slice_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_no": [], "frame_payload": [], "frame_sha": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n = min(max_frames, max(1, len(payload) // every_n_bytes))
                for i in range(n):
                    chunk = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    out["media_id"].append(mid)
                    out["frame_no"].append(i)
                    out["frame_payload"].append(chunk)
                    out["frame_sha"].append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(slice_frames, FRAMES_SCHEMA)


def media_frame_index(documents: DataFrame) -> DataFrame:
    """Frame-level content index over the media table (rows-only check)."""
    frames = sample_frames(to_media_table(documents))
    return (
        frames.groupBy("media_id")
        .agg(
            F.count("*").alias("n_frames"),
            F.countDistinct("frame_sha").alias("n_unique_frames"),
        )
    )


EMBED_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads (E-13 → E-11 bridge).

    A real pipeline would run an image/audio encoder here; the container
    has no model runtime, so the deterministic stand-in is an L2-
    normalized 16-bin byte histogram — computed *vectorized* with numpy
    over each Arrow batch (``np.frombuffer`` + ``bincount``; no per-byte
    Python). What this verifies end-to-end: binary columns through Arrow,
    batch-shaped UDF compute, and an ``array<double>`` embedding column
    that the similarity operators consume unchanged.
    """
    import numpy as np

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for p in pdf["payload"]:
                a = np.frombuffer(bytes(p), dtype=np.uint8)
                h = np.bincount(a >> 4, minlength=EMBED_DIM).astype("float64")
                norm = float(np.linalg.norm(h))
                embs.append((h / norm if norm > 0 else h).tolist())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "embedding": embs}
            )

    return media.mapInPandas(featurize, FEATURES_SCHEMA)


def media_embedding_topk(
    documents: DataFrame, n_queries: int = 10, k: int = 5
) -> DataFrame:
    """Nearest media by extracted-feature cosine: the full multimodal
    retrieval path (payload → embedding → top-k) on one plan.

    Same broadcast-queries + window top-k shape as
    ``similarity.ann_bruteforce_topk``; embeddings are unit-norm so the
    dot product IS the cosine. Deterministic fake features → rows-only
    driver check; pytest pins determinism and self-exclusion.
    """
    from pyspark.sql import Window

    from kinesis_dstream_spark.functions import vectors as V

    feats = extract_features(to_media_table(documents))
    queries = feats.filter(F.col("media_id") < n_queries).select(
        F.col("media_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = feats.join(
        F.broadcast(queries), F.col("media_id") != F.col("q_id")
    ).select(
        "q_id",
        F.col("media_id").alias("c_id"),
        F.round(V.dot(F.col("q_emb"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("c_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cos_sim", "rk")
    )


# ---------------------------------------------------------------------------
# REAL audio decode (stdlib wave — no external codec libs needed)
# ---------------------------------------------------------------------------

WAV_SAMPLE_RATE = 8000
_WAV_PERIOD = 16  # square-wave period in samples (8 high, 8 low)


def synth_wav_table(documents: DataFrame) -> DataFrame:
    """(media_id, payload) where payload is a GENUINE RIFF/WAV container:
    PCM16 mono square wave, written by stdlib ``wave`` inside mapInPandas.

    Unlike ``to_media_table`` (text bytes posing as media), these
    payloads are real audio files any WAV reader can open. Duration and
    amplitude derive deterministically from doc_id:

        n_samples = 800 + (doc_id % 5) * 80      (100-140 ms @ 8 kHz)
        amplitude = 1000 + (doc_id % 7) * 500    (peak sample value)

    which makes every decoded property analytically predictable — the
    foundation of the ``wav_decode_stats`` oracle: a DuckDB query can
    compute the expected stats from doc_id alone, so a hash-match PROVES
    the Spark side really parsed the container and the sample frames.
    """
    import io
    import wave

    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                n = 800 + (int(doc_id) % 5) * 80
                amp = 1000 + (int(doc_id) % 7) * 500
                half = _WAV_PERIOD // 2
                pattern = np.concatenate(
                    [np.full(half, amp), np.full(half, -amp)]
                ).astype("<i2")
                samples = np.tile(pattern, n // _WAV_PERIOD + 1)[:n]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_SAMPLE_RATE)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return documents.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary"
    )


def resample_wav_batch(media: DataFrame, factor: int = 5) -> DataFrame:
    """REAL audio resample: decode PCM16 frames, block-average every
    ``factor`` consecutive samples (the anti-aliasing decimator — NOT a
    pick-every-Nth shortcut), and re-encode a genuine WAV at
    rate/factor. Output payloads are valid audio files the standard
    decoder reads back, which is how ``wav_resample_stats`` certifies
    this op: on the synthetic square wave, block means straddling the
    half-period transitions produce an rms of exactly amp·√0.6 — a
    naive sample-picker would return amp and hash-mismatch.

    Same scale posture as every media op: mapInPandas, codecs in the
    closure, zero exchange, malformed payloads quarantined to null.
    """
    import io
    import wave

    import numpy as np

    def resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    with wave.open(io.BytesIO(payload), "rb") as w:
                        if w.getnchannels() != 1 or w.getsampwidth() != 2:
                            raise ValueError("unsupported WAV variant")
                        sr = w.getframerate()
                        nf = w.getnframes()
                        frames = np.frombuffer(
                            w.readframes(nf), dtype="<i2"
                        ).astype(np.float64)
                    n2 = nf // factor
                    means = frames[: n2 * factor].reshape(n2, factor).mean(axis=1)
                    quantized = np.rint(means).astype("<i2")
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(2)
                        w.setframerate(sr // factor)
                        w.writeframes(quantized.tobytes())
                    out.append((int(mid), buf.getvalue()))
                except Exception:
                    out.append((int(mid), None))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return media.mapInPandas(resample, "media_id long, payload binary")


def wav_resample_stats(documents: DataFrame, factor: int = 5) -> DataFrame:
    """Synthesize real WAVs, RESAMPLE them (decode → block-mean
    decimate → re-encode), decode the resampled files with the
    standard decoder, and emit per-file stats. The oracle predicts
    every stat analytically: rate/5, n/5 samples, peak = amp (blocks
    fully inside a half-period), rms = amp·√0.6 (the 16 block-offset
    phases of a 5-sample window over the 16-sample square wave average
    to 240/400 of amp² — exact integer arithmetic end to end, one
    final sqrt). One fused mapInPandas chain, no shuffle.
    """
    return decode_wav_batch(resample_wav_batch(synth_wav_table(documents), factor))


WAV_STATS_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_ms double, peak int, rms double"
)


def decode_wav_batch(media: DataFrame) -> DataFrame:
    """REAL media decode (E-13, non-stub): parse the WAV container with
    stdlib ``wave``, then compute signal stats off the PCM frames.

    Same Arrow-batch shape as ``decode_media_batch``; the difference is
    that nothing here is faked — header fields come from the RIFF
    chunks, peak/rms from the int16 samples. Malformed payloads yield a
    null-stats row instead of failing the batch (the 100 TB posture:
    quarantine, don't crash)."""
    import io
    import wave

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    with wave.open(io.BytesIO(payload), "rb") as w:
                        sr = w.getframerate()
                        nch = w.getnchannels()
                        nf = w.getnframes()
                        frames = np.frombuffer(
                            w.readframes(nf), dtype="<i2"
                        ).astype(np.float64)
                    rows.append(
                        (
                            int(mid),
                            sr,
                            nch,
                            nf,
                            round(nf * 1000.0 / sr, 3),
                            int(np.abs(frames).max()) if len(frames) else 0,
                            round(float(np.sqrt((frames**2).mean())), 4)
                            if len(frames)
                            else 0.0,
                        )
                    )
                except Exception:
                    rows.append((int(mid), None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "n_samples",
                    "duration_ms",
                    "peak",
                    "rms",
                ],
            )

    return media.mapInPandas(decode, WAV_STATS_SCHEMA)


def wav_decode_stats(documents: DataFrame) -> DataFrame:
    """Synthesize real WAVs, decode them back, emit per-file stats.

    End-to-end REAL-decode exhibit: bytes → container parse → sample
    math, all inside one mapInPandas chain (the synth and decode stages
    fuse into a single pass — no shuffle anywhere). The oracle predicts
    every value analytically from doc_id (square wave: rms == peak ==
    amplitude; duration = n_samples/8 ms), so the driver's hash check
    certifies the decoder, not a fixture copy of its output.
    """
    return decode_wav_batch(synth_wav_table(documents))


# ---------------------------------------------------------------------------
# REAL image decode (hand-rolled BMP: pure stdlib struct, no codec libs)
# ---------------------------------------------------------------------------


def synth_bmp_table(documents: DataFrame) -> DataFrame:
    """(media_id, payload) where payload is a GENUINE 24bpp BMP file —
    BITMAPFILEHEADER + BITMAPINFOHEADER + bottom-up padded BGR rows,
    openable by any image viewer. Dimensions and pixels derive from
    doc_id:

        width  = 8 + doc_id % 8, height = 8 + doc_id % 5
        B = doc_id % 256 (constant), G = 128 (constant),
        R = 255 on the (x+y)-even checkerboard cells else 0

    The checkerboard forces the decoder to traverse every pixel (a
    header-only or first-byte cheat cannot reproduce avg_r), while
    keeping every decoded stat analytically computable from doc_id —
    the same certify-the-decoder oracle design as ``wav_decode_stats``.
    """
    import struct

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 8, 8 + d % 5
                b, g = d % 256, 128
                row_pad = (-(w * 3)) % 4
                rows = []
                for y in range(h - 1, -1, -1):  # bottom-up
                    row = bytearray()
                    for x in range(w):
                        r = 255 if (x + y) % 2 == 0 else 0
                        row += bytes((b, g, r))  # BGR
                    rows.append(bytes(row) + b"\x00" * row_pad)
                pixels = b"".join(rows)
                header = struct.pack(
                    "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
                )
                payloads.append(header + pixels)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return documents.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary"
    )


BMP_STATS_SCHEMA = (
    "media_id long, width int, height int, bpp int, "
    "avg_b double, avg_g double, avg_r double"
)


def decode_bmp_batch(media: DataFrame) -> DataFrame:
    """REAL image decode: parse BMP headers with stdlib struct, walk the
    bottom-up padded pixel rows, average each channel. Malformed
    payloads quarantine to null rows (same posture as WAV)."""
    import struct

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload)
                    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", p, 0)
                    if magic != b"BM":
                        raise ValueError("not a BMP")
                    (hsz, w, h, planes, bpp) = struct.unpack_from("<IiiHH", p, 14)
                    if bpp != 24 or planes != 1 or w <= 0 or h == 0:
                        raise ValueError("unsupported BMP variant")
                    stride = (w * 3 + 3) // 4 * 4
                    nrows = abs(h)
                    px = np.frombuffer(
                        p, dtype=np.uint8, count=stride * nrows, offset=offset
                    ).reshape(nrows, stride)[:, : w * 3].reshape(nrows, w, 3)
                    means = px.astype(np.float64).mean(axis=(0, 1))
                    rows.append(
                        (
                            int(mid),
                            w,
                            nrows,
                            bpp,
                            round(float(means[0]), 4),
                            round(float(means[1]), 4),
                            round(float(means[2]), 4),
                        )
                    )
                except Exception:
                    rows.append((int(mid), None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "bpp", "avg_b", "avg_g", "avg_r",
                ],
            )

    return media.mapInPandas(decode, BMP_STATS_SCHEMA)


def bmp_decode_stats(documents: DataFrame) -> DataFrame:
    """Synthesize real BMPs, decode them back, emit per-image stats —
    the image twin of ``wav_decode_stats`` (one fused mapInPandas chain,
    no shuffle; oracle computes every stat from doc_id analytically)."""
    return decode_bmp_batch(synth_bmp_table(documents))


def resize_bmp_batch(media: DataFrame, factor: int = 3) -> DataFrame:
    """REAL image resize: decode each BMP, nearest-neighbor downsample
    by ``factor`` in image space (top-origin pixel (x, y) samples
    source (factor·x, factor·y)), and RE-ENCODE a genuine 24bpp
    bottom-up BMP — output payloads are valid image files, so the
    existing certified decoder can read them (which is exactly how
    ``bmp_resize_stats`` verifies this encoder).

    The mandated multimodal `resize` step, structured for scale like
    every decode here: mapInPandas, codec logic in the closure, zero
    exchange; payloads never leave the executor except as the resized
    bytes. Malformed inputs quarantine to null payloads.
    """
    import struct

    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload)
                    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", p, 0)
                    if magic != b"BM":
                        raise ValueError("not a BMP")
                    (_, w, h, planes, bpp) = struct.unpack_from("<IiiHH", p, 14)
                    if bpp != 24 or planes != 1 or w <= 0 or h <= 0:
                        raise ValueError("unsupported BMP variant")
                    stride = (w * 3 + 3) // 4 * 4
                    px = np.frombuffer(
                        p, dtype=np.uint8, count=stride * h, offset=offset
                    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                    img = px[::-1]  # bottom-up storage -> image space
                    w2, h2 = max(w // factor, 1), max(h // factor, 1)
                    small = img[: h2 * factor : factor, : w2 * factor : factor]
                    pad = (-(w2 * 3)) % 4
                    body = b"".join(
                        bytes(small[y].tobytes()) + b"\x00" * pad
                        for y in range(h2 - 1, -1, -1)  # re-encode bottom-up
                    )
                    hdr = struct.pack(
                        "<2sIHHI", b"BM", 54 + len(body), 0, 0, 54
                    ) + struct.pack(
                        "<IiiHHIIiiII",
                        40, w2, h2, 1, 24, 0, len(body), 2835, 2835, 0, 0,
                    )
                    out.append((int(mid), hdr + body))
                except Exception:
                    out.append((int(mid), None))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return media.mapInPandas(resize, "media_id long, payload binary")


def bmp_resize_stats(documents: DataFrame, factor: int = 3) -> DataFrame:
    """Synthesize real BMPs, RESIZE them (decode → NN downsample →
    re-encode), then decode the resized files with the standard
    decoder and emit per-image stats.

    Factor 3 preserves the source checkerboard's parity structure
    (pixel (3x, 3y) has parity(x + y)), so every stat of the RESIZED
    image is analytically computable from doc_id: the oracle predicts
    dimensions, constant channels, and avg_r = 255·|even cells|/(w₂h₂)
    — a hash match certifies decode, sampling arithmetic, AND the
    re-encoder, since the stats are read from the re-encoded bytes.
    One fused mapInPandas chain, no shuffle.
    """
    return decode_bmp_batch(resize_bmp_batch(synth_bmp_table(documents), factor))


# ---------------------------------------------------------------------------
# REAL video decode (YUV4MPEG2 / .y4m: text header + raw planes, stdlib-only)
# ---------------------------------------------------------------------------


def synth_y4m_table(documents: DataFrame) -> DataFrame:
    """(media_id, payload) where payload is a GENUINE .y4m video stream —
    `YUV4MPEG2` header + per-frame `FRAME` markers + raw C444 planes,
    playable by ffmpeg/mpv. Deterministic from doc_id:

        width = 8 + doc_id % 4, height = 8 + doc_id % 3
        n_frames = 2 + doc_id % 4
        frame f: Y plane constant (doc_id % 200) + 10*f, U = V = 128

    Y stays < 230 < 256 (no modular wrap) so the mean luma across frames
    is analytically `doc_id % 200 + 5 * (n_frames - 1)` — the
    certify-the-decoder oracle again, now over MULTIPLE frames: a
    decoder that miscounts frames or misreads plane sizes cannot
    reproduce avg_y."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h, n = 8 + d % 4, 8 + d % 3, 2 + d % 4
                parts = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()]
                for f in range(n):
                    parts.append(b"FRAME\n")
                    parts.append(bytes([d % 200 + 10 * f]) * (w * h))  # Y
                    parts.append(bytes([128]) * (w * h))  # U
                    parts.append(bytes([128]) * (w * h))  # V
                payloads.append(b"".join(parts))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return documents.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary"
    )


Y4M_STATS_SCHEMA = (
    "media_id long, width int, height int, n_frames int, colorspace string, "
    "avg_y double"
)


def decode_y4m_batch(media: DataFrame) -> DataFrame:
    """REAL video decode: parse the YUV4MPEG2 stream header, iterate
    FRAME sections, accumulate per-frame Y-plane means. Malformed
    payloads quarantine to null rows."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload)
                    nl = p.index(b"\n")
                    head = p[:nl].decode("ascii").split()
                    if head[0] != "YUV4MPEG2":
                        raise ValueError("not y4m")
                    params = {t[0]: t[1:] for t in head[1:]}
                    w, h = int(params["W"]), int(params["H"])
                    cs = params.get("C", "420")
                    if cs == "444":
                        frame_bytes = w * h * 3
                    elif cs in ("420", "420jpeg", "420mpeg2", "420paldv"):
                        frame_bytes = w * h * 3 // 2
                    else:
                        raise ValueError(f"unsupported colorspace {cs}")
                    pos, y_means, nf = nl + 1, [], 0
                    while pos < len(p):
                        fnl = p.index(b"\n", pos)
                        if not p[pos:fnl].startswith(b"FRAME"):
                            raise ValueError("bad frame marker")
                        plane = np.frombuffer(
                            p, dtype=np.uint8, count=w * h, offset=fnl + 1
                        )
                        y_means.append(plane.astype(np.float64).mean())
                        pos = fnl + 1 + frame_bytes
                        nf += 1
                    rows.append(
                        (
                            int(mid), w, h, nf, f"C{cs}",
                            round(float(np.mean(y_means)), 4) if nf else None,
                        )
                    )
                except Exception:
                    rows.append((int(mid), None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "n_frames", "colorspace", "avg_y",
                ],
            )

    return media.mapInPandas(decode, Y4M_STATS_SCHEMA)


def y4m_decode_stats(documents: DataFrame) -> DataFrame:
    """Synthesize real .y4m videos, decode them back, emit per-video
    stats — the video member of the real-decode family (WAV / BMP /
    Y4M). One fused mapInPandas chain; analytic DuckDB oracle."""
    return decode_y4m_batch(synth_y4m_table(documents))


def sample_y4m_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """REAL video temporal downsample: parse the YUV4MPEG2 stream, keep
    every ``every``-th FRAME section (frames 0, every, 2·every, …), and
    re-emit a genuine .y4m with the frame rate denominator scaled —
    the frame-sampling step of a video-training pipeline (dense frames
    are redundant; models train on sampled ones), operating on real
    container bytes rather than a row index.

    Output payloads are valid streams the standard decoder reads back,
    which is how ``y4m_frame_sample_stats`` certifies the sampler: the
    synthetic per-frame luma ramp makes the kept-frame mean analytic
    (kept frames 0,2,…  ⇒ avg_y = base + 10·(n_kept−1)), so keeping
    the wrong frames — or all of them — hash-mismatches. mapInPandas,
    zero exchange, malformed payloads quarantined.
    """
    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload)
                    nl = p.index(b"\n")
                    head = p[:nl].decode("ascii").split()
                    if head[0] != "YUV4MPEG2":
                        raise ValueError("not y4m")
                    params = {t[0]: t[1:] for t in head[1:]}
                    w, h = int(params["W"]), int(params["H"])
                    cs = params.get("C", "420")
                    if cs == "444":
                        frame_bytes = w * h * 3
                    elif cs.startswith("420"):
                        frame_bytes = w * h * 3 // 2
                    else:
                        raise ValueError(f"unsupported colorspace {cs}")
                    num, den = (params.get("F", "25:1")).split(":")
                    new_head = " ".join(
                        t if not t.startswith("F") else f"F{num}:{int(den) * every}"
                        for t in head
                    ).encode("ascii")
                    parts, pos, fidx = [new_head + b"\n"], nl + 1, 0
                    while pos < len(p):
                        fnl = p.index(b"\n", pos)
                        if not p[pos:fnl].startswith(b"FRAME"):
                            raise ValueError("bad frame marker")
                        end = fnl + 1 + frame_bytes
                        if fidx % every == 0:
                            parts.append(p[pos:end])
                        pos, fidx = end, fidx + 1
                    out.append((int(mid), b"".join(parts)))
                except Exception:
                    out.append((int(mid), None))
            yield pd.DataFrame(out, columns=["media_id", "payload"])

    return media.mapInPandas(sample, "media_id long, payload binary")


def y4m_frame_sample_stats(documents: DataFrame, every: int = 2) -> DataFrame:
    """Synthesize real videos, temporally downsample (keep every 2nd
    frame), decode the sampled streams with the standard decoder, emit
    stats. Completes the REAL media-transform trio: image resize
    (spatial), audio resample (temporal 1-D), video frame-sample
    (temporal frames) — each certified by an analytic oracle over the
    re-encoded bytes. One fused mapInPandas chain, no shuffle.
    """
    return decode_y4m_batch(sample_y4m_frames(synth_y4m_table(documents), every))


# --------------------------------------------------------------------------
# binaryFile source: media ingestion from raw files (E-1 × E-13)
# --------------------------------------------------------------------------


def stage_media_files(spark: DataFrame, sf_dir: str) -> str:
    """Stage each document's payload as one raw ``<doc_id>.bin`` file.

    This materializes the fixture corpus the way real media actually
    arrives — a directory of opaque files, not rows in a table. Writing
    happens in ``foreachPartition`` on the executors (no driver-side
    collect); in local mode all executors share /tmp, which stands in
    for the shared object store a cluster would write to. Staged once
    per sf behind a marker file.
    """
    import os
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    d = os.path.join(tempfile.gettempdir(), "kds_binary_media", tag)
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        from kinesis_dstream_spark.tables import load_table

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

        def write_part(rows) -> None:
            for r in rows:
                with open(os.path.join(d, f"{r.doc_id}.bin"), "wb") as f:
                    f.write(r.text.encode("utf-8"))

        docs.foreachPartition(write_part)
        with open(marker, "w"):
            pass
    return d


def binary_file_media_stats(spark, sf_dir: str) -> DataFrame:
    """Ingest raw media files via Spark's ``binaryFile`` source.

    ``spark.read.format("binaryFile")`` is the production entry point
    for bulk media: each file becomes (path, modificationTime, length,
    content) with the bytes as a first-class binary column — exactly the
    payload column `to_media_table` models. The scan parallelizes over
    files; content hashing (`sha2`) runs JVM-side per Arrow batch. The
    file id parsed from the path joins the metadata table (the standard
    "object store + catalog" layout), and the per-source rollup is
    oracle-checked: DuckDB recomputes byte counts and sha256 digests
    from the source texts, so a corrupted write, a lossy read, or a
    mis-parsed filename all break the hash.
    """
    from kinesis_dstream_spark.tables import load_table

    d = stage_media_files(spark, sf_dir)
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(d)
        .select(
            F.regexp_extract(
                F.element_at(F.split(F.col("path"), "/"), -1), r"(\d+)\.bin", 1
            )
            .cast("long")
            .alias("media_id"),
            F.sha2(F.col("content"), 256).alias("content_sha"),
            F.col("length").alias("n_bytes"),
        )
    )
    meta = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"), "source"
    )
    return (
        files.join(meta, "media_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("content_sha").alias("n_unique_payloads"),
        )
    )


def _bmp_block_sums(p: bytes):
    """Decode a 24bpp BMP payload and reduce it to the 8×8 block-grid
    integer sums: returns (s, c) int64 arrays where s[by][bx] is the
    summed gray (= B+G+R) of the block and c its pixel count, via the
    floor mapping bx = x·8//w shared verbatim with the SQL oracles —
    the one decode used by BOTH the aHash and the DCT-pHash paths
    (r13: factored, not duplicated)."""
    import struct

    import numpy as np

    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", p, 0)
    if magic != b"BM":
        raise ValueError("not a BMP")
    (_, w, h, planes, bpp) = struct.unpack_from("<IiiHH", p, 14)
    if bpp != 24 or planes != 1 or w <= 0 or h <= 0:
        raise ValueError("unsupported BMP variant")
    stride = (w * 3 + 3) // 4 * 4
    px = np.frombuffer(
        p, dtype=np.uint8, count=stride * h, offset=offset
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    img = px[::-1]  # image space, top-origin
    gray = img.astype(np.int64).sum(axis=2)  # B+G+R
    bx = (np.arange(w) * 8) // w
    by = (np.arange(h) * 8) // h
    s = np.zeros((8, 8), dtype=np.int64)
    c = np.zeros((8, 8), dtype=np.int64)
    np.add.at(s, (by[:, None], bx[None, :]), gray)
    np.add.at(c, (by[:, None], bx[None, :]), 1)
    return s, c


def perceptual_hash_bmp_batch(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprints from REAL decoded
    pixels: gray = B+G+R per pixel (channel sum — the monotone
    equivalent of mean luma, so every comparison stays integer), an
    8x8 block grid via the floor mapping bx = x*8//w (both sides use
    THIS mapping, not block-start ranges, so parity is exact), and
    bit(by,bx) = 1 iff block mean > image mean decided by integer
    cross-multiplication ``s_block*n_total > s_total*n_block`` (ties
    -> 0; no division anywhere). Emits the hash as a 64-char row-major
    bitstring plus the exact content digest for within-group
    accounting. mapInPandas, zero exchange, codec in the closure."""
    import hashlib

    import numpy as np

    def phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload)
                    s, c = _bmp_block_sums(p)
                    ts, tc = int(s.sum()), int(c.sum())
                    bits = (s * tc > ts * c).astype(np.uint8)
                    rows.append(
                        (
                            int(mid),
                            "".join("1" if b else "0" for b in bits.ravel()),
                            hashlib.sha256(p).hexdigest(),
                        )
                    )
                except Exception:
                    rows.append((int(mid), None, None))
            yield pd.DataFrame(rows, columns=["media_id", "phash", "content_sha"])

    return media.mapInPandas(phash, "media_id long, phash string, content_sha string")


def media_perceptual_dedup(documents: DataFrame) -> DataFrame:
    """Perceptual near-dup groups over REAL image files — the dedup
    class exact content hashing cannot reach: the fixture's B channel
    shifts with doc_id (a global brightness offset), so byte-level
    digests call every file unique while aHash — mean-relative by
    construction — collapses the brightness variants into structural
    groups. ``n_distinct_contents > 1`` per group is exactly the
    recall that ``media_dedup_by_content`` misses.

    Scale shape: one fused synth→hash mapInPandas chain (zero
    exchange), then ONE groupBy on the 64-bit hash — the same
    hash-groupBy cost as exact dedup, at any corpus size; no pairwise
    comparison exists. The oracle recomputes the identical integer
    aHash from the analytic pixel formula, so a hash match certifies
    decode + block arithmetic end to end.
    """
    hashed = perceptual_hash_bmp_batch(synth_bmp_table(documents))
    return (
        hashed.groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.countDistinct("content_sha").alias("n_distinct_contents"),
            F.min("media_id").alias("rep_media_id"),
        )
        .where(F.col("n_images") > 1)
    )


MEDIA_PERCEPTUAL_DEDUP_SQL = """
WITH xs AS (
  SELECT doc_id, unnest(generate_series(0, (8 + doc_id % 8) - 1)) AS x
  FROM documents
), px AS (
  SELECT doc_id, x, unnest(generate_series(0, (8 + doc_id % 5) - 1)) AS y
  FROM xs
), g AS (
  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h,
         (doc_id % 256) + 128
           + (CASE WHEN (x + y) % 2 = 0 THEN 255 ELSE 0 END) AS gray,
         (x * 8) // (8 + doc_id % 8) AS bx,
         (y * 8) // (8 + doc_id % 5) AS by
  FROM px
), bsum AS (
  SELECT doc_id, bx, by, sum(gray) AS s, count(*) AS c
  FROM g GROUP BY doc_id, bx, by
), tot AS (
  SELECT doc_id, sum(s) AS ts, sum(c) AS tc FROM bsum GROUP BY doc_id
), hashes AS (
  SELECT b.doc_id,
         string_agg(CASE WHEN b.s * t.tc > t.ts * b.c THEN '1' ELSE '0' END, ''
                    ORDER BY b.by, b.bx) AS phash,
         min(CAST(b.doc_id % 256 AS VARCHAR) || '_'
             || CAST(b.doc_id % 8 AS VARCHAR) || '_'
             || CAST(b.doc_id % 5 AS VARCHAR)) AS content_key
  FROM bsum b JOIN tot t USING (doc_id) GROUP BY b.doc_id
)
SELECT phash, count(*) AS n_images,
       count(DISTINCT content_key) AS n_distinct_contents,
       min(doc_id) AS rep_media_id
FROM hashes GROUP BY phash HAVING count(*) > 1
"""


# Integer 8-point DCT-II basis, C[k][x] = ±round(4096·|cos(π(2x+1)k/16)|)
# with the sign taken from the true cosine: the ± pairing of the
# 8-point cosines makes every k ≥ 1 row sum EXACTLY zero on this grid
# (module invariant, pytest-pinned), which is what makes the pHash AC
# coefficients cancel a global brightness offset EXACTLY — not
# approximately — on the integer grid. One source of truth for both
# engines: the SQL twin's literal table is rendered from THIS list.
_DCT8 = [
    [4096, 4096, 4096, 4096, 4096, 4096, 4096, 4096],
    [4017, 3406, 2276, 799, -799, -2276, -3406, -4017],
    [3784, 1567, -1567, -3784, -3784, -1567, 1567, 3784],
    [3406, -799, -4017, -2276, 2276, 4017, 799, -3406],
    [2896, -2896, -2896, 2896, 2896, -2896, -2896, 2896],
    [2276, -4017, 799, 3406, -3406, -799, 4017, -2276],
    [1567, -3784, 3784, -1567, -1567, 3784, -3784, 1567],
    [799, -2276, 3406, -4017, 4017, -3406, 2276, -799],
]


def synth_bmp_pattern_table(documents: DataFrame) -> DataFrame:
    """(media_id, payload): genuine 16×16 24bpp BMPs carrying a
    class-keyed BLOCK-CHECKER pattern plus per-doc brightness AND
    contrast variation — the fixture for the DCT pHash. Deterministic
    from doc_id:

        shape class: sx = 1 + doc_id % 3, sy = 1 + (doc_id div 3) % 3
          (9 classes; χ(bx,by) = 1 iff (bx div sx + by div sy) even)
        amp = 1 + (doc_id div 9) % 2   (contrast — ALTERNATES within a
          class: consecutive class members d, d+9 flip it, so every
          pHash group genuinely mixes contrast variants)
        B = doc_id % 256 (brightness offset), G = 128
        R(x,y) = 100·amp·χ(x div 2, y div 2)

    Blocks are uniform 2×2 pixel tiles, so the fixed-point block value
    decomposes EXACTLY into offset + amp·pattern: the DCT signs cancel
    the offset exactly (the ``_DCT8`` zero-row-sum invariant) and are
    exactly invariant to the amp scaling — every class collapses its
    brightness and contrast variants into ONE group while the 9 shapes
    stay distinct, and byte digests call every file unique."""
    import struct

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = h = 16
                sx, sy = 1 + d % 3, 1 + (d // 3) % 3
                amp = 1 + (d // 9) % 2
                b, g = d % 256, 128
                row_pad = (-(w * 3)) % 4
                rows = []
                for y in range(h - 1, -1, -1):  # bottom-up
                    row = bytearray()
                    by = y // 2
                    for x in range(w):
                        bx = x // 2
                        chi = 1 if ((bx // sx) + (by // sy)) % 2 == 0 else 0
                        row += bytes((b, g, 100 * amp * chi))  # BGR
                    rows.append(bytes(row) + b"\x00" * row_pad)
                pixels = b"".join(rows)
                header = struct.pack(
                    "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
                )
                payloads.append(header + pixels)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return documents.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary"
    )


def dct_phash_bmp_batch(media: DataFrame) -> DataFrame:
    """DCT-based perceptual hash (pHash — the robust-to-contrast image
    fingerprint production dedup actually ships, cf. the classic
    pHash/imagehash design) from REAL decoded pixels, integer end to
    end: the shared 8×8 block-mean grid (``_bmp_block_sums``, the
    aHash decode verbatim), block value v = s·4096 div c (a defined
    fixed-point, one trunc div), the integer DCT-II
    F[u][v] = Σ C[u][by]·C[v][bx]·v_b (exact int64: |F| ≤
    64·4096²·2.4e6 ≈ 3.4e15), and bit(u,v) = 1 iff F > 0 over the
    LOW-FREQUENCY 4×4 quadrant (the classic pHash top-left cut; 16
    chars, DC position pinned to 0). Signs of AC coefficients are EXACTLY
    invariant to global brightness (k ≥ 1 basis rows sum to zero — see
    ``_DCT8``) and invariant to positive contrast scaling up to the
    documented trunc-div dust — the two transforms that break
    byte-digest dedup. mapInPandas, zero exchange."""
    import hashlib

    import numpy as np

    basis = np.array(_DCT8, dtype=np.int64)

    def dhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload)
                    s, c = _bmp_block_sums(p)
                    v = (s * 4096) // c  # c ≥ 1 for the ≥8×8 fixture
                    # LOW-FREQUENCY quadrant only (u, v < 4) — the
                    # classic pHash cut: high-frequency signs of smooth
                    # content hover near zero and flip under any pixel
                    # dust, while the low quadrant's signs are backed
                    # by real energy (the disagreement pytest measures
                    # exactly this stability)
                    coeffs = (basis @ v @ basis.T)[:4, :4]
                    bits = (coeffs > 0).astype(np.uint8)
                    bits[0, 0] = 0  # DC carries only brightness
                    rows.append(
                        (
                            int(mid),
                            "".join("1" if b else "0" for b in bits.ravel()),
                            hashlib.sha256(p).hexdigest(),
                        )
                    )
                except Exception:
                    rows.append((int(mid), None, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "dct_phash", "content_sha"]
            )

    return media.mapInPandas(
        dhash, "media_id long, dct_phash string, content_sha string"
    )


def media_dct_phash_dedup(documents: DataFrame) -> DataFrame:
    """Perceptual near-dup groups by DCT-sign hash over REAL image
    files — the dedup class neither byte digests (every file unique:
    offsets differ) nor naive similarity can reach at scale: the
    gradient fixture's brightness offset AND contrast amplitude vary
    per doc, and the pHash collapses both into structural groups. ONE
    hash groupBy, no pairwise stage (the aHash discipline — at 100 TB
    this is the same shuffle as exact dedup).

    Oracle: the twin recomputes the identical integer pipeline
    (block sums → fixed-point means → literal-table DCT → signs) from
    the analytic pixel formula, so a hash match certifies decode +
    block arithmetic + the DCT fold end to end."""
    hashed = dct_phash_bmp_batch(synth_bmp_pattern_table(documents))
    return (
        hashed.groupBy("dct_phash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.countDistinct("content_sha").alias("n_distinct_contents"),
            F.min("media_id").alias("rep_media_id"),
        )
        .where(F.col("n_images") > 1)
    )


def _dct8_values_sql() -> str:
    """The ``_DCT8`` basis as a DuckDB VALUES literal (k, x, c) —
    rendered from the module list, never hand-copied."""
    return ", ".join(
        f"({k}, {x}, {_DCT8[k][x]})" for k in range(8) for x in range(8)
    )


MEDIA_DCT_PHASH_DEDUP_SQL = f"""
WITH dct AS (
  SELECT * FROM (VALUES {_dct8_values_sql()}) AS t(k, x, c)
), xs AS (
  SELECT doc_id, unnest(generate_series(0, 15)) AS x FROM documents
), px AS (
  SELECT doc_id, x, unnest(generate_series(0, 15)) AS y FROM xs
), g AS (
  SELECT doc_id,
         (doc_id % 256) + 128
           + 100 * (1 + (doc_id // 9) % 2)
             * (CASE WHEN ((x // 2) // (1 + doc_id % 3)
                           + (y // 2) // (1 + (doc_id // 3) % 3)) % 2 = 0
                THEN 1 ELSE 0 END) AS gray,
         x // 2 AS bx,
         y // 2 AS by
  FROM px
), dbsum AS (
  SELECT doc_id, bx, by, sum(gray) AS s, count(*) AS c
  FROM g GROUP BY doc_id, bx, by
), dv AS (
  SELECT doc_id, bx, by, (s * 4096) // c AS v FROM dbsum
), dco AS (
  SELECT d.doc_id, cu.k AS u, cv.k AS vf,
         CAST(sum(cu.c * cv.c * d.v) AS BIGINT) AS f
  FROM dv d
  JOIN dct cu ON cu.x = d.by AND cu.k < 4
  JOIN dct cv ON cv.x = d.bx AND cv.k < 4
  GROUP BY 1, 2, 3
), dhash AS (
  SELECT doc_id,
         string_agg(CASE WHEN u = 0 AND vf = 0 THEN '0'
                         WHEN f > 0 THEN '1' ELSE '0' END, ''
                    ORDER BY u, vf) AS dct_phash,
         min(CAST(doc_id % 256 AS VARCHAR) || '_'
             || CAST(doc_id % 3 AS VARCHAR) || '_'
             || CAST((doc_id // 3) % 3 AS VARCHAR) || '_'
             || CAST((doc_id // 9) % 2 AS VARCHAR)) AS content_key
  FROM dco GROUP BY doc_id
)
SELECT dct_phash, count(*) AS n_images,
       count(DISTINCT content_key) AS n_distinct_contents,
       min(doc_id) AS rep_media_id
FROM dhash GROUP BY dct_phash HAVING count(*) > 1
"""



def synth_y4m_shots_table(documents: DataFrame) -> DataFrame:
    """(media_id, payload): genuine .y4m streams with SHOT STRUCTURE —
    the scene-cut synthesizer for the boundary detector below.
    Deterministic from doc_id:

        width = 8 + doc_id % 4, height = 8 + doc_id % 3  (C444)
        n_frames = 3 + doc_id % 4                        (3..6)
        cut period s = 2 + doc_id % 3                    (2..4)
        Y(frame f) = doc_id % 60 + 2·f + 80·(f div s)

    Within a shot consecutive frames drift by 2 (camera motion /
    lighting noise); every s-th frame jumps by an extra 80 (a hard
    cut). Max luma = 59 + 2·5 + 80·2 = 229 < 256, so no modular wrap
    and every per-frame mean is analytic — the certify-the-detector
    oracle: a decoder that misreads plane sizes, miscounts frames, or
    diffs the wrong pairs cannot reproduce the closed-form statistics.
    """

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 4, 8 + d % 3
                n, s = 3 + d % 4, 2 + d % 3
                parts = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()]
                for f in range(n):
                    parts.append(b"FRAME\n")
                    y = d % 60 + 2 * f + 80 * (f // s)
                    parts.append(bytes([y]) * (w * h))  # Y
                    parts.append(bytes([128]) * (w * h))  # U
                    parts.append(bytes([128]) * (w * h))  # V
                payloads.append(b"".join(parts))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return documents.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary"
    )


SHOT_STATS_SCHEMA = (
    "media_id long, n_frames int, n_cuts int, n_shots int, "
    "max_frame_diff double, mean_frame_diff double"
)


def detect_y4m_shots(media: DataFrame, threshold: float = 40.0) -> DataFrame:
    """REAL shot-boundary detection: decode every frame's Y-plane mean
    from the YUV4MPEG2 stream and flag a cut wherever the absolute
    luma-mean difference between consecutive frames exceeds
    ``threshold`` — the classic pixel-domain scene-cut detector
    (PySceneDetect's ContentDetector shape, luma-only), the first step
    of a video-training pipeline that wants one clip per scene rather
    than arbitrary fixed windows.

    Per video: n_frames, n_cuts (threshold exceedances), n_shots
    (cuts+1), max and mean absolute frame-to-frame luma difference
    (4dp). Malformed payloads quarantine to null rows. mapInPandas,
    zero exchange — the whole detector is a per-partition byte scan,
    the only scale cost is reading the video bytes once.
    """
    import numpy as np

    def detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload)
                    nl = p.index(b"\n")
                    head = p[:nl].decode("ascii").split()
                    if head[0] != "YUV4MPEG2":
                        raise ValueError("not y4m")
                    params = {t[0]: t[1:] for t in head[1:]}
                    w, h = int(params["W"]), int(params["H"])
                    cs = params.get("C", "420")
                    if cs == "444":
                        frame_bytes = w * h * 3
                    elif cs.startswith("420"):
                        frame_bytes = w * h * 3 // 2
                    else:
                        raise ValueError(f"unsupported colorspace {cs}")
                    pos, y_means = nl + 1, []
                    while pos < len(p):
                        fnl = p.index(b"\n", pos)
                        if not p[pos:fnl].startswith(b"FRAME"):
                            raise ValueError("bad frame marker")
                        plane = np.frombuffer(
                            p, dtype=np.uint8, count=w * h, offset=fnl + 1
                        )
                        y_means.append(plane.astype(np.float64).mean())
                        pos = fnl + 1 + frame_bytes
                    nf = len(y_means)
                    if nf < 2:
                        rows.append((int(mid), nf, 0, 1, None, None))
                        continue
                    diffs = np.abs(np.diff(np.array(y_means)))
                    n_cuts = int((diffs > threshold).sum())
                    rows.append(
                        (
                            int(mid),
                            nf,
                            n_cuts,
                            n_cuts + 1,
                            round(float(diffs.max()), 4),
                            round(float(diffs.mean()), 4),
                        )
                    )
                except Exception:
                    rows.append((int(mid), None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_frames", "n_cuts", "n_shots",
                    "max_frame_diff", "mean_frame_diff",
                ],
            )

    return media.mapInPandas(detect, SHOT_STATS_SCHEMA)


def y4m_shot_boundary_stats(documents: DataFrame) -> DataFrame:
    """Synthesize shot-structured videos, run the real boundary
    detector, emit per-video cut statistics — the TEMPORAL-structure
    member of the video family (decode certifies planes, frame-sample
    certifies selection, this certifies frame-to-frame ANALYSIS). One
    fused mapInPandas chain; analytic closed-form DuckDB oracle."""
    return detect_y4m_shots(synth_y4m_shots_table(documents))


# Closed forms for the oracle (documented here, consumed by the
# registry twin): with n = 3 + d%4 frames and cut period s = 2 + d%3,
# diff(f→f+1) = 2 + 80·[ (f+1) % s == 0 ] exactly (constant planes ⇒
# the plane mean IS the luma byte), so over the n−1 diffs:
#   n_cuts   = (n−1) div s
#   max_diff = 82 if n_cuts ≥ 1 else 2
#   mean     = (2·(n−1) + 80·n_cuts) / (n−1)
Y4M_SHOT_BOUNDARY_SQL = """
SELECT doc_id AS media_id,
       CAST(3 + doc_id % 4 AS INT) AS n_frames,
       CAST((2 + doc_id % 4) // (2 + doc_id % 3) AS INT) AS n_cuts,
       CAST((2 + doc_id % 4) // (2 + doc_id % 3) + 1 AS INT) AS n_shots,
       round(CAST(CASE WHEN (2 + doc_id % 4) // (2 + doc_id % 3) >= 1
                  THEN 82.0 ELSE 2.0 END AS DOUBLE), 4) AS max_frame_diff,
       round((2.0 * (2 + doc_id % 4)
              + 80.0 * ((2 + doc_id % 4) // (2 + doc_id % 3)))
             / (2 + doc_id % 4), 4) AS mean_frame_diff
FROM documents
"""


_VAD_FRAME = 80  # 10 ms at 8 kHz
_VAD_RMS_THRESHOLD = 500.0


def synth_wav_speech_table(documents: DataFrame) -> DataFrame:
    """(media_id, payload): REAL RIFF/WAV clips with a deterministic
    silence–speech–silence layout (the shape VAD exists for; the plain
    square-wave synth never goes quiet). Per doc_id:

        lead silence  = 80·(1 + doc_id % 3) zero samples
        speech        = square wave, 320 + (doc_id % 4)·160 samples,
                        amplitude 1000 + (doc_id % 7)·500
        tail silence  = 160 zero samples

    Every segment length is a multiple of the 80-sample VAD frame, so
    frames never straddle a boundary and every decoded VAD statistic
    is analytically predictable from doc_id — the oracle discipline of
    the WAV family: a hash match proves the frame-energy logic ran
    over real decoded samples, not a header shortcut.
    """
    import io
    import wave

    import numpy as np

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                lead = 80 * (1 + d % 3)
                n_speech = 320 + (d % 4) * 160
                amp = 1000 + (d % 7) * 500
                half = _WAV_PERIOD // 2
                pattern = np.concatenate(
                    [np.full(half, amp), np.full(half, -amp)]
                ).astype("<i2")
                speech = np.tile(pattern, n_speech // _WAV_PERIOD + 1)[:n_speech]
                samples = np.concatenate(
                    [
                        np.zeros(lead, dtype="<i2"),
                        speech,
                        np.zeros(160, dtype="<i2"),
                    ]
                )
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_SAMPLE_RATE)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return documents.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary"
    )


VAD_STATS_SCHEMA = (
    "media_id long, n_frames long, voiced_frames long, voiced_ppm long, "
    "longest_voiced_run long, longest_silence_run long, speech_ms double"
)


def vad_segment_batch(media: DataFrame) -> DataFrame:
    """REAL energy-based voice-activity detection: decode PCM16, cut
    into 10 ms frames, mark a frame voiced when its RMS exceeds the
    threshold, and report per-clip activity structure (voiced mass +
    the longest voiced/silent runs — the quantities a speech-data
    curation pass gates on: clips that are all silence or one unbroken
    run are synthetic/broken). This is the genuine VAD kernel (frame
    energies over decoded samples, run-length analysis in numpy) —
    only the codec zoo is narrower than production. Same posture as
    every media op: one mapInPandas, codecs in the closure, zero
    exchange, malformed payloads quarantined to null rows.
    """
    import io
    import wave

    import numpy as np

    def vad(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    with wave.open(io.BytesIO(payload), "rb") as w:
                        if w.getnchannels() != 1 or w.getsampwidth() != 2:
                            raise ValueError("unsupported WAV variant")
                        nf = w.getnframes()
                        frames = np.frombuffer(
                            w.readframes(nf), dtype="<i2"
                        ).astype(np.float64)
                    n_frames = len(frames) // _VAD_FRAME
                    fr = frames[: n_frames * _VAD_FRAME].reshape(
                        n_frames, _VAD_FRAME
                    )
                    rms = np.sqrt((fr**2).mean(axis=1))
                    voiced = rms > _VAD_RMS_THRESHOLD
                    nv = int(voiced.sum())

                    def longest_run(mask: "np.ndarray") -> int:
                        best = cur = 0
                        for m in mask:
                            cur = cur + 1 if m else 0
                            best = max(best, cur)
                        return best

                    rows.append(
                        (
                            int(mid),
                            n_frames,
                            nv,
                            nv * 1_000_000 // n_frames if n_frames else 0,
                            longest_run(voiced),
                            longest_run(~voiced),
                            round(nv * _VAD_FRAME * 1000.0 / WAV_SAMPLE_RATE, 3),
                        )
                    )
                except Exception:
                    rows.append((int(mid), None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_frames",
                    "voiced_frames",
                    "voiced_ppm",
                    "longest_voiced_run",
                    "longest_silence_run",
                    "speech_ms",
                ],
            )

    return media.mapInPandas(vad, VAD_STATS_SCHEMA)


def wav_vad_stats(documents: DataFrame) -> DataFrame:
    """Synthesize speech-shaped WAVs, run the real VAD kernel on the
    decoded samples, emit per-clip activity structure. Synth and VAD
    fuse into one mapInPandas chain — no shuffle anywhere."""
    return vad_segment_batch(synth_wav_speech_table(documents))


WAV_VAD_STATS_SQL = """
SELECT doc_id AS media_id,
       (80 * (1 + doc_id % 3) + 320 + (doc_id % 4) * 160 + 160) // 80
         AS n_frames,
       (320 + (doc_id % 4) * 160) // 80 AS voiced_frames,
       CAST(((320 + (doc_id % 4) * 160) // 80) * 1000000
            // ((80 * (1 + doc_id % 3) + 320 + (doc_id % 4) * 160 + 160) // 80)
            AS BIGINT) AS voiced_ppm,
       (320 + (doc_id % 4) * 160) // 80 AS longest_voiced_run,
       greatest((80 * (1 + doc_id % 3)) // 80, 2) AS longest_silence_run,
       round(((320 + (doc_id % 4) * 160) // 80) * 80 * 1000.0 / 8000, 3)
         AS speech_ms
FROM documents
"""


def synth_bmp_texture_table(documents: DataFrame) -> DataFrame:
    """(media_id, payload): REAL 24bpp BMPs with a doc-dependent
    pseudo-texture on the R channel — ``R(x, y) = 255 iff
    (x·y + x + y + doc_id) % 5 < 2`` — instead of the plain
    checkerboard (whose gradient statistics are CONSTANT for every
    image and would make a sharpness oracle vacuous). B/G stay the
    flat channels. Every pixel is still a closed-form function of
    (doc_id, x, y), so the oracle can re-derive the full gradient
    field without touching a decoder — while the Spark side must
    genuinely walk the decoded rows to reproduce it.
    """
    import struct

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = 8 + d % 8, 8 + d % 5
                b, g = d % 256, 128
                row_pad = (-(w * 3)) % 4
                rows = []
                for y in range(h - 1, -1, -1):  # bottom-up
                    row = bytearray()
                    for x in range(w):
                        r = 255 if (x * y + x + y + d) % 5 < 2 else 0
                        row += bytes((b, g, r))
                    rows.append(bytes(row) + b"\x00" * row_pad)
                pixels = b"".join(rows)
                header = struct.pack(
                    "<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54
                ) + struct.pack(
                    "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0
                )
                payloads.append(header + pixels)
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"].astype("int64"), "payload": payloads}
            )

    return documents.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary"
    )


BMP_SHARPNESS_SCHEMA = (
    "media_id long, n_pairs long, grad_sum long, edge_pairs long, "
    "mean_grad double, edge_density_ppm long"
)


def bmp_sharpness_batch(media: DataFrame) -> DataFrame:
    """REAL image sharpness: decode the BMP pixel grid and measure
    first-difference gradient energy on the R channel — horizontal and
    vertical |ΔR| sums, edge-pair counts, and mean gradient — the
    blur/quality screen an image-curation pass runs before training
    (blurry/flat images score near 0, textured ones high). The kernel
    is the genuine 2-D neighbor walk over decoded rows (numpy diff on
    both axes); only the codec zoo is narrower than production.
    Malformed payloads quarantine to null rows.
    """
    import struct

    import numpy as np

    def sharp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload)
                    magic, _, _, _, offset = struct.unpack_from("<2sIHHI", p, 0)
                    if magic != b"BM":
                        raise ValueError("not a BMP")
                    (hsz, w, h, planes, bpp) = struct.unpack_from("<IiiHH", p, 14)
                    if bpp != 24 or planes != 1 or w <= 0 or h == 0:
                        raise ValueError("unsupported BMP variant")
                    stride = (w * 3 + 3) // 4 * 4
                    nrows = abs(h)
                    px = np.frombuffer(
                        p, dtype=np.uint8, count=stride * nrows, offset=offset
                    ).reshape(nrows, stride)[:, : w * 3].reshape(nrows, w, 3)
                    r = px[::-1, :, 2].astype(np.int64)  # top-down R plane
                    hd = np.abs(np.diff(r, axis=1))
                    vd = np.abs(np.diff(r, axis=0))
                    n_pairs = hd.size + vd.size
                    grad_sum = int(hd.sum() + vd.sum())
                    edge_pairs = int((hd > 0).sum() + (vd > 0).sum())
                    rows.append(
                        (
                            int(mid),
                            n_pairs,
                            grad_sum,
                            edge_pairs,
                            round(grad_sum / n_pairs, 6) if n_pairs else 0.0,
                            edge_pairs * 1_000_000 // n_pairs if n_pairs else 0,
                        )
                    )
                except Exception:
                    rows.append((int(mid), None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_pairs",
                    "grad_sum",
                    "edge_pairs",
                    "mean_grad",
                    "edge_density_ppm",
                ],
            )

    return media.mapInPandas(sharp, BMP_SHARPNESS_SCHEMA)


def bmp_sharpness_stats(documents: DataFrame) -> DataFrame:
    """Synthesize textured BMPs, decode, measure gradient energy —
    one fused mapInPandas chain, no shuffle. 6dp display (gradient
    means on small 1/n_pairs grids never reach a 7-decimal half
    boundary — the TWAP rule)."""
    return bmp_sharpness_batch(synth_bmp_texture_table(documents))


BMP_SHARPNESS_SQL = """
WITH dims AS (
  SELECT doc_id, 8 + doc_id % 8 AS w, 8 + doc_id % 5 AS h FROM documents
), grid AS (
  SELECT doc_id, w, h, unnest(generate_series(0, w - 1)) AS x FROM dims
), px AS (
  SELECT doc_id, w, h, x, unnest(generate_series(0, h - 1)) AS y FROM grid
), vals AS (
  SELECT doc_id, w, h, x, y,
         CASE WHEN (x * y + x + y + doc_id) % 5 < 2 THEN 255 ELSE 0 END AS v
  FROM px
), hd AS (
  SELECT a.doc_id, abs(a.v - b.v) AS d
  FROM vals a JOIN vals b
    ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
), vd AS (
  SELECT a.doc_id, abs(a.v - b.v) AS d
  FROM vals a JOIN vals b
    ON b.doc_id = a.doc_id AND b.x = a.x AND b.y = a.y + 1
), alld AS (
  SELECT doc_id, d FROM hd UNION ALL SELECT doc_id, d FROM vd
)
SELECT doc_id AS media_id,
       CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(d) AS BIGINT) AS grad_sum,
       CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS edge_pairs,
       round(CAST(sum(d) AS BIGINT) / count(*), 6) AS mean_grad,
       CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) * 1000000 // count(*)
            AS BIGINT) AS edge_density_ppm
FROM alld GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Audio constellation fingerprint (Shazam-shape; Wang 2003)
# ---------------------------------------------------------------------------

_CST_FRAME = 64          # DFT frame length (samples)
_CST_FRAMES = 16         # frames per corpus clip (1024 samples @ 8 kHz)
_CST_SNIPPET_FRAMES = 8  # frames per query snippet
_CST_SNIPPET_OFFSET = 4  # snippet starts at corpus frame 4
_CST_BINS = 31           # peak search over bins 1.._CST_BINS (DC excluded)
_CST_MAX_DT = 3          # anchor→target pairing horizon (frames)
_CST_CLASSES = 7         # melody classes in the fixture


def _melody_bin_expr(cls: str, frame: str) -> str:
    """The fixture melody law as SQL text: bin(c, f) — QUADRATIC in the
    frame index. The quadratic term is load-bearing: a linear melody
    makes classes time-shifted copies of one another, so snippet
    matching would alias across classes; with f² in the law, a
    cross-class hash collision requires 2·Δ·dt ≡ 0 (mod 31) for
    dt ∈ 1..3, i.e. Δ = 0 — provably NONE (see wav_snippet_match)."""
    return f"1 + (5 * ({cls}) + ({frame}) * ({frame}) + 3 * ({frame})) % {_CST_BINS}"


def _melody_bin_py(c: int, f: int) -> int:
    return 1 + (5 * c + f * f + 3 * f) % _CST_BINS


def _synth_melody_payloads(doc_ids, n_frames: int, frame0: int):
    """PCM16 WAV payloads for the melody fixture: per frame f one pure
    tone at bin m(c, frame0+f), bin-ALIGNED to the frame DFT (freq =
    m·SR/64), with per-doc gain (amp = 4000 + 100·(d % 29)) and phase
    (φ = (d % 8)·π/4) — the two transforms a spectral fingerprint must
    be invariant to and a byte digest is not. Samples are rounded to
    int16; the rounding leakage (|ΔX| ≲ 32) is 4 orders below the tone
    peak (|X[m]| ≈ amp·32), so the per-frame argmax is deterministic."""
    import io
    import wave

    import numpy as np

    payloads = []
    for doc_id in doc_ids:
        d = int(doc_id)
        c = d % _CST_CLASSES
        amp = 4000 + 100 * (d % 29)
        phase = (d % 8) * np.pi / 4
        i = np.arange(_CST_FRAME)
        frames = []
        for f in range(n_frames):
            m = _melody_bin_py(c, frame0 + f)
            tone = amp * np.sin(2 * np.pi * m * i / _CST_FRAME + phase)
            frames.append(np.round(tone).astype("<i2"))
        samples = np.concatenate(frames)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(WAV_SAMPLE_RATE)
            w.writeframes(samples.tobytes())
        payloads.append(buf.getvalue())
    return payloads


def synth_wav_melody_table(documents: DataFrame) -> DataFrame:
    """(media_id, payload): genuine PCM16 WAVs carrying a class-keyed
    16-frame MELODY (class c = doc_id % 7; per-frame tone bin follows
    the quadratic law ``_melody_bin_expr``) with per-doc gain and
    phase variation. Docs of one class share the melody — and nothing
    else: amplitudes and phases differ, so every payload digest is
    distinct while the constellation fingerprint collapses the class."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": _synth_melody_payloads(
                        pdf["doc_id"], _CST_FRAMES, 0
                    ),
                }
            )

    return documents.select("doc_id").mapInPandas(
        synth, "media_id long, payload binary"
    )


def synth_wav_snippet_table(documents: DataFrame) -> DataFrame:
    """Query snippets for constellation matching: every 50th doc
    re-records the MIDDLE of its class melody (frames 4..11, 512
    samples) under its own gain/phase — the time-shifted, re-gained
    re-recording the constellation hash is designed to find."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"].astype("int64"),
                    "payload": _synth_melody_payloads(
                        pdf["doc_id"],
                        _CST_SNIPPET_FRAMES,
                        _CST_SNIPPET_OFFSET,
                    ),
                }
            )

    return (
        documents.filter(F.col("doc_id") % 50 == 0)
        .select("doc_id")
        .mapInPandas(synth, "media_id long, payload binary")
    )


def wav_constellation_batch(media: DataFrame) -> DataFrame:
    """Constellation hashes from REAL decoded audio: parse the WAV,
    frame into 64 samples, per frame take the dominant spectral bin
    (``np.fft.rfft`` magnitude argmax over bins 1..31 — DC excluded;
    ties break to the lower bin), then pair each anchor frame's peak
    with the peaks of the next 1..3 frames:

        h = (bin_anchor · 32 + bin_target) · 4 + dt

    — the Shazam constellation scheme (Wang 2003): gain and phase fall
    out of the magnitude argmax, time offset falls out at MATCH time
    because dt is relative. One Arrow pass, long-format output
    (media_id, anchor, hash, content_sha); zero exchange."""
    import hashlib
    import io
    import wave

    import numpy as np

    def cst(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    p = bytes(payload)
                    with wave.open(io.BytesIO(p), "rb") as w:
                        samples = np.frombuffer(
                            w.readframes(w.getnframes()), dtype="<i2"
                        ).astype(np.float64)
                    n_frames = len(samples) // _CST_FRAME
                    frames = samples[: n_frames * _CST_FRAME].reshape(
                        n_frames, _CST_FRAME
                    )
                    mags = np.abs(np.fft.rfft(frames, axis=1))
                    peaks = 1 + np.argmax(
                        mags[:, 1 : _CST_BINS + 1], axis=1
                    )
                    sha = hashlib.sha256(p).hexdigest()
                    for f in range(n_frames):
                        for dt in range(1, _CST_MAX_DT + 1):
                            if f + dt >= n_frames:
                                break
                            h = (
                                int(peaks[f]) * 32 + int(peaks[f + dt])
                            ) * 4 + dt
                            rows.append((int(mid), f, h, sha))
                except Exception:
                    rows.append((int(mid), None, None, None))
            yield pd.DataFrame(
                rows, columns=["media_id", "anchor", "hash", "content_sha"]
            )

    return media.mapInPandas(
        cst, "media_id long, anchor int, hash int, content_sha string"
    )


def wav_fingerprint_dedup(documents: DataFrame) -> DataFrame:
    """Audio near-dup groups by constellation fingerprint over REAL
    WAV files — the audio sibling of ``media_dct_phash_dedup``: every
    payload digest is unique (gain and phase vary per doc) while the
    fingerprint (the sorted distinct hash set) collapses each melody
    class. ONE hash groupBy per stage, no pairwise stage.

    Oracle: the twin derives the expected hash set in closed form from
    the synthesis law (melody bins are analytic in (class, frame)), so
    a match certifies WAV decode + framing + DFT peak-picking + the
    constellation pairing end to end."""
    cst = wav_constellation_batch(synth_wav_melody_table(documents))
    fp = cst.groupBy("media_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_set("hash")),
                lambda h: h.cast("string"),
            ),
            "-",
        ).alias("fingerprint"),
        F.first("content_sha").alias("content_sha"),
    )
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.countDistinct("content_sha").alias("n_distinct_contents"),
            F.min("media_id").alias("rep_media_id"),
        )
        .where(F.col("n_clips") > 1)
        .select(
            "fingerprint", "n_clips", "n_distinct_contents", "rep_media_id"
        )
    )


def wav_snippet_match(documents: DataFrame, vote_min: int = 5) -> DataFrame:
    """Offset-robust audio matching — the constellation scheme's whole
    point: a time-shifted, re-gained, re-phased snippet still matches
    its source because hashes are offset-relative and votes align on
    ONE anchor offset. Query snippets (frames 4..11 of the class
    melody) hash-join the corpus constellation; votes group by
    (query, clip, offset = corpus_anchor − query_anchor); a clip
    matches when some offset's votes clear ``vote_min``.

    The quadratic melody makes the expected answer exact: a cross-
    class collision at frame shift Δ needs 2·Δ·dt ≡ 0 (mod 31) for the
    target bin AFTER the anchor bin already collided — impossible for
    dt ∈ 1..3 and Δ ≠ 0, and Δ = 0 forces same class. So every query
    matches exactly its class members, each at offset 4 with the full
    18 votes (8 anchors → 7+6+5 pairs), and nothing else — which is
    what the closed-form oracle asserts.

    Scale shape: queries are sparse (every 50th doc) and their hash
    lists are tiny (18 rows each) — the query side BROADCASTS into the
    corpus constellation join; votes and the match cut are two small
    aggregations. The corpus constellation is the same artifact the
    dedup entry builds — at production scale it is the persisted index
    this join serves against."""
    corpus = wav_constellation_batch(synth_wav_melody_table(documents))
    queries = wav_constellation_batch(synth_wav_snippet_table(documents))
    votes = (
        corpus.alias("c")
        .join(
            F.broadcast(
                queries.select(
                    F.col("media_id").alias("query_id"),
                    F.col("anchor").alias("q_anchor"),
                    "hash",
                )
            ),
            "hash",
        )
        .groupBy(
            "query_id",
            F.col("media_id").alias("clip_id"),
            (F.col("anchor") - F.col("q_anchor")).alias("offset"),
        )
        .agg(F.count(F.lit(1)).alias("votes"))
        .where(F.col("votes") >= vote_min)
    )
    return (
        votes.groupBy("query_id")
        .agg(
            F.countDistinct("clip_id").alias("n_matched_clips"),
            F.min("offset").cast("long").alias("best_offset"),
            F.max("votes").alias("max_votes"),
        )
        .orderBy("query_id")
        .select("query_id", "n_matched_clips", "best_offset", "max_votes")
    )


def _cst_hash_cte(prefix: str, cls: str, n_frames: int, frame0: int) -> str:
    """Closed-form constellation hash set for one synthesized clip
    family: frames from the melody law, anchor/target pairing as SQL.
    ``cls`` is an expression in doc_id; emitted once per consumer with
    a distinct prefix (the knng_cte_sql parameter discipline)."""
    return f"""
{prefix}f AS (
  SELECT doc_id, unnest(generate_series(0, {n_frames - 1})) AS f
  FROM documents
), {prefix}b AS (
  SELECT doc_id, f,
         {_melody_bin_expr(cls, f"f + {frame0}")} AS bin
  FROM {prefix}f
), {prefix}h AS (
  SELECT a.doc_id, a.f AS anchor,
         (a.bin * 32 + t.bin) * 4 + (t.f - a.f) AS hash
  FROM {prefix}b a
  JOIN {prefix}b t
    ON t.doc_id = a.doc_id
   AND t.f > a.f AND t.f <= a.f + {_CST_MAX_DT}
)"""


WAV_FINGERPRINT_DEDUP_SQL = f"""
WITH {_cst_hash_cte("k", f"doc_id % {_CST_CLASSES}", _CST_FRAMES, 0)},
kfp AS (
  SELECT doc_id,
         string_agg(CAST(hash AS VARCHAR), '-' ORDER BY hash)
           AS fingerprint,
         -- payload bytes are determined exactly by (gain, phase,
         -- class): the distinct-content key the sha256 digests count
         min(CAST(doc_id % 29 AS VARCHAR) || '_'
             || CAST(doc_id % 8 AS VARCHAR) || '_'
             || CAST(doc_id % {_CST_CLASSES} AS VARCHAR)) AS content_key
  FROM (SELECT DISTINCT doc_id, hash FROM kh) GROUP BY doc_id
)
SELECT fingerprint, count(*) AS n_clips,
       count(DISTINCT content_key) AS n_distinct_contents,
       min(doc_id) AS rep_media_id
FROM kfp GROUP BY fingerprint HAVING count(*) > 1
"""


WAV_SNIPPET_MATCH_SQL = f"""
WITH {_cst_hash_cte("c", f"doc_id % {_CST_CLASSES}", _CST_FRAMES, 0)},
{_cst_hash_cte(
    "q",
    f"doc_id % {_CST_CLASSES}",
    _CST_SNIPPET_FRAMES,
    _CST_SNIPPET_OFFSET,
)},
qh2 AS (
  SELECT doc_id, anchor, hash FROM qh WHERE doc_id % 50 = 0
), v AS (
  SELECT q.doc_id AS query_id, c.doc_id AS clip_id,
         c.anchor - q.anchor AS "offset", count(*) AS votes
  FROM ch c JOIN qh2 q USING (hash)
  GROUP BY 1, 2, 3 HAVING count(*) >= 5
)
SELECT query_id, count(DISTINCT clip_id) AS n_matched_clips,
       CAST(min("offset") AS BIGINT) AS best_offset,
       max(votes) AS max_votes
FROM v GROUP BY query_id ORDER BY query_id
"""
