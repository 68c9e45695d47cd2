"""Multimodal column plumbing (E-13): binary payloads, content
addressing, mapInPandas decode batches."""

from __future__ import annotations

import hashlib

from pyspark.sql.types import BinaryType, StructType

from kinesis_dstream_spark.operators import multimodal
from kinesis_dstream_spark.tables import load_table


def test_media_table_schema(spark, sf_dir):
    media = multimodal.to_media_table(load_table(spark, sf_dir, "documents"))
    fields = dict(zip(media.schema.fieldNames(), [f.dataType for f in media.schema.fields]))
    assert isinstance(fields["payload"], BinaryType)
    assert isinstance(fields["meta"], StructType)


def test_content_sha_matches_hashlib(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    row = docs.select("doc_id", "text").first()
    idx = (
        multimodal.media_content_index(docs)
        .filter(f"media_id = {row.doc_id}")
        .first()
    )
    assert idx.content_sha == hashlib.sha256(row.text.encode()).hexdigest()
    assert idx.n_bytes == len(row.text.encode())


def test_decode_batch_deterministic_and_complete(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.to_media_table(docs)
    a = {tuple(r) for r in multimodal.decode_media_batch(media).collect()}
    b = {tuple(r) for r in multimodal.decode_media_batch(media).collect()}
    assert a == b
    assert len(a) == docs.count()
    # fake decoder contract: plausible dims, marked as fake
    for r in a:
        _, n_bytes, w, h, c, decoder = r
        assert w >= 64 and h >= 64 and c == 3 and decoder in ("fake", "pillow")


def test_media_dedup_groups_by_content(spark):
    df = spark.createDataFrame(
        [(1, "same text", "en", "s", 9), (2, "same text", "en", "s", 9),
         (3, "other", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {(r.keep_id, r.n_copies) for r in multimodal.media_dedup_by_content(df).collect()}
    assert rows == {(1, 2), (3, 1)}


def test_extract_features_unit_norm_and_deterministic(spark, sf_dir):
    from kinesis_dstream_spark.operators.multimodal import extract_features, to_media_table
    from kinesis_dstream_spark.tables import load_table

    media = to_media_table(load_table(spark, sf_dir, "documents"))
    a = {r.media_id: tuple(r.embedding) for r in extract_features(media).collect()}
    b = {r.media_id: tuple(r.embedding) for r in extract_features(media).collect()}
    assert a == b
    for emb in list(a.values())[:20]:
        assert abs(sum(x * x for x in emb) - 1.0) < 1e-9


def test_media_embedding_topk_shape(spark, sf_dir):
    from kinesis_dstream_spark.operators.multimodal import media_embedding_topk
    from kinesis_dstream_spark.tables import load_table

    out = media_embedding_topk(load_table(spark, sf_dir, "documents"), n_queries=5, k=3)
    rows = out.collect()
    per_q = {}
    for r in rows:
        assert r.q_id != r.c_id
        per_q.setdefault(r.q_id, []).append(r.rk)
    for q, rks in per_q.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))


def test_wav_decode_is_a_real_container_parse(spark, sf_dir):
    """The WAV payloads must be readable by stdlib wave OUTSIDE Spark —
    proving they're genuine RIFF containers, not shaped fakes."""
    import io
    import wave

    from kinesis_dstream_spark.operators.multimodal import synth_wav_table
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(5)
    for r in synth_wav_table(docs).collect():
        with wave.open(io.BytesIO(bytes(r["payload"])), "rb") as w:
            assert w.getframerate() == 8000
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 2
            assert w.getnframes() in {800 + k * 80 for k in range(5)}


def test_wav_decode_quarantines_malformed_payloads(spark):
    """A corrupt payload yields a null-stats row, never a batch failure."""
    from kinesis_dstream_spark.operators.multimodal import decode_wav_batch

    df = spark.createDataFrame(
        [(1, b"not a wav at all"), (2, b""), (3, b"RIFF....WAVEjunk")],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_wav_batch(df).collect()}
    assert len(rows) == 3
    for r in rows.values():
        assert r["sample_rate"] is None and r["rms"] is None


def test_bmp_payloads_are_real_bmp_files(spark, sf_dir):
    """Headers must parse with stdlib struct outside Spark, and the
    pixel section must be exactly stride*height bytes."""
    import struct

    from kinesis_dstream_spark.operators.multimodal import synth_bmp_table
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(5)
    for r in synth_bmp_table(docs).collect():
        p = bytes(r["payload"])
        magic, fsize, _, _, offset = struct.unpack_from("<2sIHHI", p, 0)
        assert magic == b"BM" and fsize == len(p) and offset == 54
        _, w, h, planes, bpp = struct.unpack_from("<IiiHH", p, 14)
        stride = (w * 3 + 3) // 4 * 4
        assert planes == 1 and bpp == 24
        assert len(p) - offset == stride * h


def test_bmp_decode_quarantines_malformed_payloads(spark):
    from kinesis_dstream_spark.operators.multimodal import decode_bmp_batch

    df = spark.createDataFrame(
        [(1, b"GIF89a junk"), (2, b""), (3, b"BM\x00\x00truncated")],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_bmp_batch(df).collect()}
    assert len(rows) == 3
    assert all(r["width"] is None and r["avg_r"] is None for r in rows.values())


def test_y4m_payloads_have_valid_stream_structure(spark, sf_dir):
    """Validate the y4m container independently: header magic, frame
    markers at exactly frame_bytes intervals, total length consistent."""
    from kinesis_dstream_spark.operators.multimodal import synth_y4m_table
    from kinesis_dstream_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(5)
    for r in synth_y4m_table(docs).collect():
        p = bytes(r["payload"])
        nl = p.index(b"\n")
        head = p[:nl].decode().split()
        assert head[0] == "YUV4MPEG2"
        params = {t[0]: t[1:] for t in head[1:]}
        w, h = int(params["W"]), int(params["H"])
        frame_bytes = w * h * 3
        pos, frames = nl + 1, 0
        while pos < len(p):
            assert p[pos : pos + 6] == b"FRAME\n"
            pos += 6 + frame_bytes
            frames += 1
        assert pos == len(p) and frames >= 2


def test_y4m_decode_quarantines_malformed_payloads(spark):
    from kinesis_dstream_spark.operators.multimodal import decode_y4m_batch

    df = spark.createDataFrame(
        [(1, b"MPEG nope\n"), (2, b""), (3, b"YUV4MPEG2 W8 H8 C999\nFRAME\n")],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_y4m_batch(df).collect()}
    assert len(rows) == 3
    assert all(r["width"] is None and r["avg_y"] is None for r in rows.values())


def test_bmp_resize_roundtrip_and_quarantine(spark, sf_dir):
    """Resized payloads must be genuine BMPs (the standard decoder
    reads them), dimensions must be exactly src//3, and the parity
    structure must survive sampling; malformed inputs quarantine to
    null payloads rather than poisoning the batch."""
    from kinesis_dstream_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").limit(40)
    resized = multimodal.resize_bmp_batch(multimodal.synth_bmp_table(docs))
    stats = {
        r.media_id: r for r in multimodal.decode_bmp_batch(resized).collect()
    }
    for r in multimodal.decode_bmp_batch(multimodal.synth_bmp_table(docs)).collect():
        s = stats[r.media_id]
        assert s.width == r.width // 3 and s.height == r.height // 3
        assert s.bpp == 24
        assert s.avg_b == r.avg_b and s.avg_g == 128.0
    # malformed payload -> null payload, well-formed neighbor survives
    bad = spark.createDataFrame(
        [(1, bytearray(b"not a bmp")), ], "media_id long, payload binary"
    )
    out = multimodal.resize_bmp_batch(bad).collect()
    assert len(out) == 1 and out[0].payload is None


def test_wav_resample_certifies_true_averaging(spark, sf_dir):
    """The resampled square wave's rms must be amp*sqrt(0.6) — the
    signature of real block-mean decimation (a pick-every-Nth shortcut
    returns amp); headers must carry rate/5 and n/5; malformed
    payloads quarantine."""
    import math

    from kinesis_dstream_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").limit(40)
    src = {r.media_id: r for r in multimodal.wav_decode_stats(docs).collect()}
    out = multimodal.decode_wav_batch(
        multimodal.resample_wav_batch(multimodal.synth_wav_table(docs))
    ).collect()
    assert len(out) == 40
    for r in out:
        s = src[r.media_id]
        assert r.sample_rate == s.sample_rate // 5
        assert r.n_samples == s.n_samples // 5
        assert r.peak == s.peak
        assert abs(r.rms - round(s.peak * math.sqrt(0.6), 4)) < 1e-9
    bad = spark.createDataFrame(
        [(1, bytearray(b"RIFFjunk"))], "media_id long, payload binary"
    )
    assert multimodal.resample_wav_batch(bad).collect()[0].payload is None


def test_y4m_frame_sampler_keeps_the_right_frames(spark, sf_dir):
    """The sampler must keep frames 0,2,... (the luma ramp pins WHICH
    frames survived), halve the frame-rate denominator in the header,
    and quarantine malformed payloads."""
    from kinesis_dstream_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").limit(30)
    sampled = multimodal.sample_y4m_frames(multimodal.synth_y4m_table(docs))
    payloads = {r.media_id: bytes(r.payload) for r in sampled.collect()}
    for d, p in payloads.items():
        head = p[: p.index(b"\n")].decode()
        assert "F25:2" in head
        n = 2 + d % 4
        assert p.count(b"FRAME\n") == (n + 1) // 2
        # first kept frame is frame 0: its Y plane is the base luma
        first_y = p[p.index(b"FRAME\n") + 6]
        assert first_y == d % 200
    bad = spark.createDataFrame(
        [(1, bytearray(b"YUV4MPEG2 garbage"))], "media_id long, payload binary"
    )
    assert multimodal.sample_y4m_frames(bad).collect()[0].payload is None


def test_perceptual_hash_is_brightness_invariant(spark, sf_dir):
    """The defining aHash property: adding a constant to every pixel
    must not change the hash (mean-relative bits), while flipping the
    checkerboard structure must. Also: groups must merge images whose
    exact content digests differ."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = {
        r.media_id: (r.phash, r.content_sha)
        for r in multimodal.perceptual_hash_bmp_batch(
            multimodal.synth_bmp_table(docs)
        ).collect()
    }
    # doc ids congruent mod lcm(8,5)=40 share dims; different mod-256
    # brightness -> different sha, same phash
    ids = sorted(hashed)
    pairs = [(a, a + 40) for a in ids if a + 40 in hashed]
    assert pairs
    for a, b in pairs:
        assert hashed[a][0] == hashed[b][0], (a, b)
        assert hashed[a][1] != hashed[b][1] or (a % 256) == (b % 256)
    # every group the query returns must contain >1 distinct content
    groups = multimodal.media_perceptual_dedup(docs).collect()
    assert groups
    for g in groups:
        assert g.n_images > 1
        assert len(g.phash) == 64 and set(g.phash) <= {"0", "1"}


def test_perceptual_hash_quarantines_malformed(spark):
    bad = spark.createDataFrame(
        [(7, bytearray(b"BMjunk"))], "media_id long, payload binary"
    )
    row = multimodal.perceptual_hash_bmp_batch(bad).collect()[0]
    assert row.phash is None and row.content_sha is None


# ---------------------------------------------------------------------------
# DCT pHash (r13)
# ---------------------------------------------------------------------------


def _mk_bmp(w, h, rfun, b=0, g=128):
    """Genuine 24bpp BMP with R = rfun(x, y) — test-local synthesizer
    (same container layout as synth_bmp_table)."""
    import struct

    row_pad = (-(w * 3)) % 4
    rows = []
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            row += bytes((b, g, max(0, min(255, rfun(x, y)))))
        rows.append(bytes(row) + b"\x00" * row_pad)
    px = b"".join(rows)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0
    )
    return hdr + px


def test_dct_basis_rows_sum_exactly_zero():
    """The module invariant the offset-cancellation proof rests on:
    every k >= 1 row of the integer DCT basis sums to EXACTLY zero
    (the ± pairing of the 8-point cosines survives rounding)."""
    for k in range(1, 8):
        assert sum(multimodal._DCT8[k]) == 0, k
    assert all(c == 4096 for c in multimodal._DCT8[0])


def test_dct_phash_groups_mix_brightness_and_contrast_variants(spark, sf_dir):
    """The robustness class the operator exists for: within a pHash
    group there must be members that differ in BOTH the brightness
    offset (doc_id % 256) and the contrast amplitude ((doc_id//9) % 2)
    — byte digests call all of them unique."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = multimodal.dct_phash_bmp_batch(
        multimodal.synth_bmp_pattern_table(docs)
    ).collect()
    by_hash = {}
    for r in hashed:
        by_hash.setdefault(r.dct_phash, []).append(r.media_id)
    mixed = 0
    for ids in by_hash.values():
        if len(ids) < 2:
            continue
        amps = {(i // 9) % 2 for i in ids}
        offs = {i % 256 for i in ids}
        if len(amps) == 2 and len(offs) > 1:
            mixed += 1
    assert mixed > 0, "no group mixes contrast AND brightness variants"
    groups = multimodal.media_dct_phash_dedup(docs).collect()
    assert groups
    for g in groups:
        assert g.n_images > 1
        assert g.n_distinct_contents > 1
        assert len(g.dct_phash) == 16 and set(g.dct_phash) <= {"0", "1"}


def test_illumination_tilt_flips_ahash_not_dct_phash(spark):
    """THE disagreement exhibit (r12 verdict task 5): aHash compares
    every block against the GLOBAL mean, so blocks whose means sit on
    the mean (the transition band here) flip under a small
    illumination tilt; the DCT low-frequency signs are backed by the
    macro pattern's energy and survive it. An exact affine contrast
    stretch leaves BOTH hashes unchanged (both are mean-relative /
    offset-cancelling by construction) — measured 8 aHash bit flips
    vs 0 pHash flips under the tilt at these parameters."""
    w = h = 16

    def base_r(x, y):
        bx, by = (x * 8) // w, (y * 8) // h
        if bx in (3, 4):  # block mean == global mean: fragile for aHash
            return 120
        return 120 + 60 * (1 if (bx < 3) == (by < 4) else -1)

    variants = {
        "base": base_r,
        "tilt": lambda x, y: base_r(x, y) + (x * 10) // w,
        "affine": lambda x, y: (base_r(x, y) * 3) // 2 - 40,
    }
    media = spark.createDataFrame(
        [(i, bytearray(_mk_bmp(w, h, f))) for i, (n, f) in enumerate(variants.items())],
        "media_id long, payload binary",
    )
    a = {r.media_id: r.phash for r in
         multimodal.perceptual_hash_bmp_batch(media).collect()}
    d = {r.media_id: r.dct_phash for r in
         multimodal.dct_phash_bmp_batch(media).collect()}
    base_id, tilt_id, aff_id = 0, 1, 2
    assert a[base_id] != a[tilt_id], "tilt failed to flip aHash"
    assert d[base_id] == d[tilt_id], "tilt flipped the DCT pHash"
    assert a[base_id] == a[aff_id]
    assert d[base_id] == d[aff_id]


def test_constellation_invariance_and_classes(spark):
    """Gain and phase variation must not move the constellation
    fingerprint; distinct melody classes must not share it — the
    audio analog of the pHash robustness contract."""
    from pyspark.sql import functions as F

    # doc_ids chosen so classes (d % 7) repeat under different gain
    # (d % 29) and phase (d % 8): 3 and 45 share class 3; 0/7/14 class 0
    docs = spark.createDataFrame(
        [(0,), (7,), (14,), (3,), (45,), (1,)], "doc_id long"
    )
    cst = multimodal.wav_constellation_batch(
        multimodal.synth_wav_melody_table(docs)
    )
    fps = {
        r.media_id: r.fp
        for r in cst.groupBy("media_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_set("hash")),
                    lambda h: h.cast("string"),
                ),
                "-",
            ).alias("fp")
        )
        .collect()
    }
    assert fps[0] == fps[7] == fps[14], "same class must share fingerprint"
    assert fps[3] == fps[45]
    assert len({fps[0], fps[3], fps[1]}) == 3, "classes must stay distinct"
    # payload digests, by contrast, are all unique (the dedup class a
    # byte digest cannot reach)
    shas = (
        multimodal.synth_wav_melody_table(docs)
        .select(F.sha2("payload", 256))
        .distinct()
        .count()
    )
    assert shas == 6


def test_constellation_cross_class_hash_disjointness(spark):
    """The quadratic melody's no-collision law, pinned as data: hash
    SETS of different classes are fully disjoint (a cross-class
    collision would need 2·Δ·dt ≡ 0 mod 31 with dt ∈ 1..3 — none),
    which is why snippet matching has zero false positives."""
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(c,) for c in range(7)], "doc_id long")
    cst = multimodal.wav_constellation_batch(
        multimodal.synth_wav_melody_table(docs)
    )
    n_hashes = cst.select("hash").distinct().count()
    per_class = (
        cst.groupBy("media_id")
        .agg(F.size(F.collect_set("hash")).alias("n"))
        .agg(F.sum("n").alias("s"))
        .collect()[0]
        .s
    )
    assert n_hashes == per_class, "cross-class hash collision detected"


def test_snippet_match_exact_closed_form(spark, sf_dir):
    """Every query matches exactly its class members, at offset 4,
    with the full 18 votes (8 snippet anchors → 7+6+5 pairs) — the
    analytic answer the oracle asserts, checked here per row."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    rows = multimodal.wav_snippet_match(docs).collect()
    assert len(rows) == len(
        [r for r in docs.where(F.col("doc_id") % 50 == 0).collect()]
    )
    for r in rows:
        cls = r.query_id % 7
        class_size = len(
            [1 for d in range(n_docs) if d % 7 == cls]
        )
        assert r.n_matched_clips == class_size
        assert r.best_offset == 4
        assert r.max_votes == 18
