"""LLM-data-pipeline operators: dedup family, similarity search, text
analysis, multimodal plumbing."""

import pytest

from pyspark.sql import Row, functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),          # exact dup of 0
        (2, "the quick brown fox leaps over the lazy dog"),          # near dup of 0
        (3, "completely different content about spark engines"),
        (4, "el rapido zorro marron salta sobre el perro perezoso y es un zorro"),
        (5, "the quick brown fox jumps over the lazy cat today"),    # near dup of 0
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    from feathub_spark.datapipe.dedup import exact_dedup

    kept = exact_dedup(docs, ["text"], "doc_id").orderBy("doc_id").collect()
    assert [r.doc_id for r in kept] == [0, 2, 3, 4, 5]
    assert kept[0].dup_count == 2


def test_minhash_lsh_finds_near_dups(docs):
    from feathub_spark.datapipe.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        docs, "text", "doc_id", num_hashes=64, bands=16, shingle_k=2, threshold=0.4
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found  # exact dup always caught
    assert (0, 2) in found or (1, 2) in found  # near dup caught
    assert all(r.jaccard >= 0.4 for r in pairs)


def test_dedup_clusters_star_equals_label(spark):
    """Both CC algorithms must produce identical clusters on random
    graphs (including singleton pairs and multiple components)."""
    import random

    from feathub_spark.datapipe.dedup import dedup_clusters

    rnd = random.Random(23)
    pairs = {(rnd.randrange(0, 60), rnd.randrange(0, 60)) for _ in range(70)}
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    label = {r["id"]: r["cluster_id"]
             for r in dedup_clusters(df, algorithm="label").collect()}
    star = {r["id"]: r["cluster_id"]
            for r in dedup_clusters(df, algorithm="star").collect()}
    assert star == label

    with pytest.raises(ValueError):
        dedup_clusters(df, algorithm="turbo")


def test_dedup_clusters_star_handles_long_chain(spark):
    """A 300-link duplicate chain: label propagation needs ~300 rounds
    (raises at the default 20), the star alternation converges in
    O(log n) and labels the whole chain with its minimum."""
    from feathub_spark.datapipe.dedup import dedup_clusters

    chain = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(chain, ["id_a", "id_b"])
    with pytest.raises(RuntimeError, match="star"):
        dedup_clusters(df, algorithm="label")
    got = {r["id"]: r["cluster_id"]
           for r in dedup_clusters(df, algorithm="star", max_iterations=20).collect()}
    assert got == {i: 0 for i in range(301)}


def test_minhash_index_incremental_match(docs, spark):
    """Index the 'historical' half, match the 'new' half against it: the
    matches must be exactly the cross (new x indexed) subset of the full
    batch near-dup pairs at the same parameters, with identical jaccard
    values; a re-ingested exact replica matches at 1.0."""
    from feathub_spark.datapipe.dedup import (
        match_minhash_index,
        minhash_index,
        minhash_lsh_pairs,
    )

    kw = dict(num_hashes=64, bands=16, shingle_k=2, seed=42)
    old = docs.filter(F.col("doc_id") <= 2)
    new = docs.filter(F.col("doc_id") >= 3)
    index = minhash_index(old, "text", "doc_id", **kw)
    got = {
        (r["new_id"], r["match_id"]): r["jaccard"]
        for r in match_minhash_index(
            new, index, "text", "doc_id", threshold=0.4, **kw
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.4, **kw
        ).collect()
    }
    exp = {(b, a): j for (a, b), j in full.items() if a <= 2 and b >= 3}
    assert got == exp

    # a re-ingested exact replica of doc 0 must match it at jaccard 1.0
    replica = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"],
    )
    hits = match_minhash_index(
        replica, index, "text", "doc_id", threshold=0.9, **kw
    ).collect()
    assert {(r["new_id"], r["match_id"], r["jaccard"]) for r in hits} == {
        (100, 0, 1.0), (100, 1, 1.0)
    }


def test_ngram_jaccard_exact(docs):
    from feathub_spark.datapipe.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=2, threshold=0.99).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}
    assert pairs[0].jaccard == 1.0


def test_ngram_jaccard_doc_freq_cut(docs):
    """With the stop-gram cut, scores stay exact for every surfaced pair."""
    from feathub_spark.datapipe.dedup import ngram_jaccard_pairs

    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", n=2, threshold=0.3).collect()
    }
    cut = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", n=2, threshold=0.3, max_doc_freq=3
        ).collect()
    }
    # recall may drop, precision and scores may not
    assert set(cut) <= set(full)
    for pair, score in cut.items():
        assert score == full[pair]
    assert (0, 1) in cut  # exact dup still found


def test_dedup_clusters(spark):
    from feathub_spark.datapipe.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (10, 11), (3, 4)], ["id_a", "id_b"]
    )
    labels = {r.id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    # chain 1-2-3-4 collapses to min id 1; 7-9 and 10-11 separate
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7, 10: 10, 11: 10}


def test_dedup_clusters_raises_when_unconverged(spark):
    # a 10-node path propagates the min label one hop per round, so
    # max_iterations=2 cannot converge — must raise, never return
    # silently-split components
    import pytest

    from feathub_spark.datapipe.dedup import dedup_clusters

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_clusters(chain, max_iterations=2)
    labels = {
        r.id: r.cluster_id for r in dedup_clusters(chain, max_iterations=15).collect()
    }
    assert set(labels.values()) == {0}


def test_simhash_pairs(docs):
    from feathub_spark.datapipe.dedup import simhash_pairs

    pairs = simhash_pairs(docs, "text", "doc_id", max_hamming=6, bands=8).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found
    zero = [r for r in pairs if (r.id_a, r.id_b) == (0, 1)][0]
    assert zero.hamming == 0


def test_text_analysis(docs):
    from feathub_spark.datapipe.text import analyze_documents

    out = {r.doc_id: r for r in analyze_documents(docs).collect()}
    assert out[0].n_tokens == 9
    assert out[0].n_distinct_tokens == 8  # 'the' twice
    assert out[0].lang_guess == "en"
    assert out[4].lang_guess == "es"
    assert out[0].fingerprint == out[1].fingerprint
    assert out[0].fingerprint != out[2].fingerprint
    assert 0 <= out[3].quality <= 1


def test_brute_force_and_lsh_topk(spark):
    import math
    import random

    from feathub_spark.datapipe.similarity import brute_force_topk, lsh_topk

    rnd = random.Random(0)
    dims = 16

    def vec(seed_vec=None, noise=0.0):
        if seed_vec is None:
            v = [rnd.gauss(0, 1) for _ in range(dims)]
        else:
            v = [x + rnd.gauss(0, noise) for x in seed_vec]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    base = vec()
    rows = [(0, base)] + [(i, vec(base, 0.05)) for i in range(1, 4)] + [
        (i, vec()) for i in range(4, 40)
    ]
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in rows]
    )
    queries = df.filter(F.col("vec_id") == 0)

    exact = brute_force_topk(df, queries, "embedding", "vec_id", k=3).collect()
    assert {r.neighbor_id for r in exact} == {1, 2, 3}
    assert [r.rank for r in sorted(exact, key=lambda r: r.rank)] == [1, 2, 3]

    approx = lsh_topk(
        df, queries, "embedding", "vec_id", k=3, planes=8, bands=4, dims=dims
    ).collect()
    # LSH is approximate: all returned neighbors must be genuinely similar,
    # and the near-duplicates (cos ~0.999) should be found
    assert {r.neighbor_id for r in approx} & {1, 2, 3}


def test_multimodal_plumbing(spark):
    from feathub_spark.datapipe.multimodal import (
        decode_image_metadata,
        frame_sample_plan,
    )

    df = spark.createDataFrame(
        [(1, bytearray(b"payload-one")), (2, bytearray(b"payload-two")), (3, None)],
        ["media_id", "payload"],
    )
    out = decode_image_metadata(df, "payload", fake=True).collect()
    metas = {r.media_id: r.image_meta for r in out}
    assert metas[1].width >= 16 and metas[1].channels in (1, 2, 3)
    # deterministic: same payload → same metadata
    out2 = decode_image_metadata(df, "payload", fake=True).collect()
    assert {r.media_id: r.image_meta for r in out2} == metas

    # non-image bytes on the real decode path raise cleanly
    with pytest.raises(Exception):
        decode_image_metadata(df, "payload", fake=False).collect()

    frames = frame_sample_plan(df.filter("payload IS NOT NULL"), "payload", 500)
    n = frames.count()
    assert n >= 2  # at least one frame per media row
    assert frames.select("frame_offset_ms").distinct().count() > 1


def _png_bytes(width, height, color_type=6):
    import struct
    import zlib

    ihdr = struct.pack(">II5B", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )


def _jpeg_bytes(width, height, channels=3, progressive=False):
    import struct

    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    comps = b"".join(struct.pack("3B", i + 1, 0x11, 0) for i in range(channels))
    sof = struct.pack(">HB2HB", 8 + 3 * channels, 8, height, width, channels) + comps
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    return b"\xff\xd8" + app0 + sof_marker + sof + b"\xff\xd9"


def _gif_bytes(width, height):
    import struct

    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"


def test_parse_image_header_real_formats():
    from feathub_spark.datapipe.multimodal import parse_image_header

    assert parse_image_header(_png_bytes(640, 480)) == (640, 480, 4, "png")
    assert parse_image_header(_png_bytes(31, 7, color_type=0)) == (31, 7, 1, "png")
    # marker scan must skip APP0 and handle progressive SOF2
    assert parse_image_header(_jpeg_bytes(800, 600)) == (800, 600, 3, "jpeg")
    assert parse_image_header(_jpeg_bytes(12, 34, channels=1, progressive=True)) == (
        12, 34, 1, "jpeg",
    )
    assert parse_image_header(_gif_bytes(300, 200)) == (300, 200, 3, "gif")
    with pytest.raises(ValueError):
        parse_image_header(b"not an image at all")
    with pytest.raises(ValueError):
        parse_image_header(b"\xff\xd8\xff\xd9")  # JPEG with no SOF


def test_decode_image_metadata_real(spark):
    import hashlib

    from feathub_spark.datapipe.multimodal import decode_image_metadata

    rows = [
        (1, bytearray(_png_bytes(100, 50))),
        (2, bytearray(_jpeg_bytes(64, 32))),
        (3, bytearray(_gif_bytes(10, 20))),
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    metas = {
        r.media_id: r.image_meta
        for r in decode_image_metadata(df, "payload", fake=False).collect()
    }
    assert (metas[1].width, metas[1].height, metas[1].channels, metas[1].format) == (
        100, 50, 4, "png",
    )
    assert (metas[2].width, metas[2].height, metas[2].channels, metas[2].format) == (
        64, 32, 3, "jpeg",
    )
    assert (metas[3].width, metas[3].height, metas[3].channels, metas[3].format) == (
        10, 20, 3, "gif",
    )
    assert metas[1].content_md5 == hashlib.md5(_png_bytes(100, 50)).hexdigest()


def _wav_bytes(n_channels, sample_rate, bits, n_frames):
    import struct

    byte_rate = sample_rate * n_channels * bits // 8
    block_align = n_channels * bits // 8
    data_size = n_frames * block_align
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, bits
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_size) + b"\x00" * data_size
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_parse_audio_header_wav():
    from feathub_spark.datapipe.multimodal import parse_audio_header

    wav = _wav_bytes(2, 44100, 16, 44100)  # one second of stereo 16-bit
    assert parse_audio_header(wav) == (2, 44100, 16, 1000, "wav")
    mono = _wav_bytes(1, 8000, 8, 4000)  # half a second of mono 8-bit
    assert parse_audio_header(mono) == (1, 8000, 8, 500, "wav")
    with pytest.raises(ValueError):
        parse_audio_header(b"ID3\x03mp3 data here")
    with pytest.raises(ValueError):
        parse_audio_header(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt chunk


def test_decode_audio_metadata(spark):
    from feathub_spark.datapipe.multimodal import decode_audio_metadata

    rows = [
        (1, bytearray(_wav_bytes(2, 16000, 16, 8000))),
        (2, bytearray(_wav_bytes(1, 48000, 24, 12000))),
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    metas = {
        r.media_id: r.audio_meta
        for r in decode_audio_metadata(df, "payload", fake=False).collect()
    }
    assert (
        metas[1].n_channels, metas[1].sample_rate,
        metas[1].bits_per_sample, metas[1].duration_ms, metas[1].format,
    ) == (2, 16000, 16, 500, "wav")
    assert metas[2].duration_ms == 250
    # fake path is deterministic and accepts any bytes
    df2 = spark.createDataFrame([(9, bytearray(b"mp3?"))], ["media_id", "payload"])
    out = decode_audio_metadata(df2, "payload", fake=True).collect()[0].audio_meta
    out2 = decode_audio_metadata(df2, "payload", fake=True).collect()[0].audio_meta
    assert out == out2 and out.format == "fake"


def test_ngram_jaccard_auto_cut_matches_exact_on_small_corpus(docs):
    """auto cut = max(64, 0.1% of corpus) — a no-op below 64 docs, so the
    default must reproduce the exact (max_doc_freq=None) result."""
    from feathub_spark.datapipe.dedup import ngram_jaccard_pairs

    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", n=2, threshold=0.3, max_doc_freq=None
        ).collect()
    }
    auto = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", n=2, threshold=0.3).collect()
    }
    assert auto == exact


def test_ngram_jaccard_auto_cut_bounds_stop_gram_fanout(spark):
    """70 identical docs: every gram is corpus-wide, so the auto doc-freq cut
    (64 < 70) removes them all from the inverted index — no candidates, no
    quadratic fan-out.  Exact mode still sees all 70*69/2 pairs."""
    from feathub_spark.datapipe.dedup import ngram_jaccard_pairs

    rows = [(i, "same same same same") for i in range(70)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert ngram_jaccard_pairs(df, "text", "doc_id", n=2, threshold=0.5).count() == 0
    assert (
        ngram_jaccard_pairs(
            df, "text", "doc_id", n=2, threshold=0.5, max_doc_freq=None
        ).count()
        == 70 * 69 // 2
    )


def test_embedding_neardup_unblocked_uses_srp_buckets(spark):
    """block_col=None must NOT be an n² cross join: candidates come from
    banded SRP buckets (no CartesianProduct/BroadcastNestedLoopJoin in the
    plan), precision stays exact, and true near-duplicates are found."""
    import math
    import random

    from feathub_spark.datapipe.dedup import embedding_neardup_pairs

    rnd = random.Random(1)
    dims = 16

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    base = unit([rnd.gauss(0, 1) for _ in range(dims)])
    rows = (
        [(0, base)]
        + [(i, unit([x + rnd.gauss(0, 0.02) for x in base])) for i in range(1, 4)]
        + [(i, unit([rnd.gauss(0, 1) for _ in range(dims)])) for i in range(4, 30)]
    )
    df = spark.createDataFrame([Row(vec_id=i, embedding=v) for i, v in rows])

    out = embedding_neardup_pairs(df, "embedding", "vec_id", threshold=0.95)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    pairs = out.collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # the clones of vector 0 are ~cos 0.999 of each other — SRP buckets catch them
    assert (0, 1) in found and (0, 2) in found
    assert all(r.cosine >= 0.95 for r in pairs)


def test_char_entropy_and_printable_ratio(spark):
    from feathub_spark.datapipe.text import char_entropy, printable_ratio

    df = spark.createDataFrame(
        [
            (0, ""),               # empty -> 0 by convention
            (1, "aaaa"),           # one symbol -> 0 bits
            (2, "abab"),           # two equiprobable -> 1 bit
            (3, "abcd"),           # four equiprobable -> 2 bits
            (4, "ab\x01\x02"),     # half non-printable
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["e"], r["p"])
        for r in df.select(
            "doc_id",
            char_entropy("text").alias("e"),
            printable_ratio("text").alias("p"),
        ).collect()
    }
    assert out[0] == (0.0, 0.0)
    assert out[1] == (0.0, 1.0)
    assert out[2] == (1.0, 1.0)
    assert out[3] == (2.0, 1.0)
    assert out[4] == (2.0, 0.5)  # 4 equiprobable chars, half printable


def test_resize_plan(spark):
    from feathub_spark.datapipe.multimodal import resize_plan

    rows = [
        (1, bytearray(_png_bytes(200, 100))),   # wide: scale 0.32 by width
        (2, bytearray(_jpeg_bytes(50, 40))),    # fits: never upscale
        (3, bytearray(_gif_bytes(64, 128))),    # tall: scale 0.5 by height
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    metas = {
        r.media_id: r.resize_meta
        for r in resize_plan(df, "payload", 64, 64).collect()
    }
    assert (metas[1].dst_width, metas[1].dst_height, metas[1].scale) == (64, 32, 0.32)
    assert (metas[2].dst_width, metas[2].dst_height, metas[2].scale) == (50, 40, 1.0)
    assert (metas[3].dst_width, metas[3].dst_height, metas[3].scale) == (32, 64, 0.5)
    # non-image payloads raise on the real path, stub on fake
    junk = spark.createDataFrame([(9, bytearray(b"nope"))], ["media_id", "payload"])
    with pytest.raises(Exception):
        resize_plan(junk, "payload", 64, 64).collect()
    assert resize_plan(junk, "payload", 64, 64, fake=True).count() == 1


def test_parse_audio_header_odd_chunk_padding():
    """RIFF chunks are word-aligned: an odd-sized chunk is padded by one
    byte — the walker must skip the pad to find later chunks."""
    import struct

    from feathub_spark.datapipe.multimodal import parse_audio_header

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    odd = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # 3 bytes + pad
    chunks = (
        odd
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 4000)
    )
    wav = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    assert parse_audio_header(wav) == (1, 8000, 8, 500, "wav")


def test_token_count_quantiles(spark):
    from feathub_spark.datapipe.text import token_count_quantiles

    # en: token counts 1..10 -> p50 = value at pos 1+floor(9*0.5)=5,
    # p90 at pos 9, p99 at pos 9 (floor(9*0.99)=8)
    rows = [("en", " ".join(["w"] * n)) for n in range(1, 11)]
    rows += [("de", "a b"), ("de", "a b c d")]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {
        r["lang"]: (r["n_docs"], r["p50"], r["p90"], r["p99"])
        for r in token_count_quantiles(df, "text", "lang").collect()
    }
    assert out["en"] == (10, 5, 9, 9)
    # n=2: p99 position = 1 + floor(1 * 0.99) = 1 -> the LOWER value
    assert out["de"] == (2, 2, 2, 2)


def _mp4_box(fourcc, body):
    return (len(body) + 8).to_bytes(4, "big") + fourcc + body


def _mp4_bytes(w, h, duration, timescale, extra_audio_track=False):
    """Handcrafted minimal ISO BMFF layout (independent of the parser):
    ftyp + moov(mvhd + trak(tkhd) [+ audio trak with 0x0 dims])."""
    ftyp = _mp4_box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isom")
    mvhd = _mp4_box(
        b"mvhd",
        bytes(4)                      # version 0 + flags
        + bytes(8)                    # creation + modification
        + timescale.to_bytes(4, "big")
        + duration.to_bytes(4, "big")
        + bytes(80),                  # rate/volume/reserved/matrix/next id
    )
    def trak(tw, th):
        tkhd = _mp4_box(
            b"tkhd",
            bytes(76) + (tw << 16).to_bytes(4, "big") + (th << 16).to_bytes(4, "big"),
        )
        return _mp4_box(b"trak", tkhd)
    body = mvhd + trak(w, h)
    if extra_audio_track:
        body += trak(0, 0)
    return ftyp + _mp4_box(b"moov", body)


def test_parse_video_header_mp4():
    from feathub_spark.datapipe.multimodal import parse_video_header

    w, h, dur, ts, nt, fmt = parse_video_header(_mp4_bytes(640, 360, 90000, 600))
    assert (w, h, fmt) == (640, 360, "mp4")
    assert dur == 90000 * 1000 // 600 and ts == 600 and nt == 1

    # audio tracks (0x0 dims) are counted but never override the video dims
    w, h, dur, ts, nt, fmt = parse_video_header(
        _mp4_bytes(1920, 1080, 1000, 1000, extra_audio_track=True)
    )
    assert (w, h, nt, dur) == (1920, 1080, 2, 1000)

    with pytest.raises(ValueError):
        parse_video_header(b"not a video at all")
    with pytest.raises(ValueError):
        parse_video_header(_mp4_box(b"ftyp", b"isom") )  # no moov


def test_decode_video_metadata(spark):
    from feathub_spark.datapipe.multimodal import decode_video_metadata

    rows = [
        (1, _mp4_bytes(320, 240, 5000, 1000)),
        (2, _mp4_bytes(640, 480, 1200, 600, extra_audio_track=True)),
    ]
    df = spark.createDataFrame(rows, "vid long, payload binary")
    got = {
        r["vid"]: r["video_meta"].asDict()
        for r in decode_video_metadata(df, "payload").collect()
    }
    assert got[1]["width"] == 320 and got[1]["height"] == 240
    assert got[1]["duration_ms"] == 5000 and got[1]["n_tracks"] == 1
    assert got[2]["width"] == 640 and got[2]["duration_ms"] == 2000
    assert got[2]["n_tracks"] == 2 and got[2]["format"] == "mp4"

    # non-MP4 payloads raise unless fake=True
    bad = spark.createDataFrame([(3, b"junk")], "vid long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|cannot decode"):
        decode_video_metadata(bad, "payload").collect()
    fk = decode_video_metadata(bad, "payload", fake=True).collect()[0]["video_meta"]
    assert fk["format"] == "fake" and fk["width"] >= 160


def test_parse_video_header_requires_mvhd():
    from feathub_spark.datapipe.multimodal import parse_video_header

    tkhd = _mp4_box(b"tkhd", bytes(76) + (320 << 16).to_bytes(4, "big")
                    + (240 << 16).to_bytes(4, "big"))
    no_mvhd = (
        _mp4_box(b"ftyp", b"isom" + bytes(4) + b"isom")
        + _mp4_box(b"moov", _mp4_box(b"trak", tkhd))
    )
    with pytest.raises(ValueError, match="mvhd"):
        parse_video_header(no_mvhd)


def test_parse_video_header_v1_and_largesize():
    """Version-1 mvhd/tkhd (64-bit times shift the field offsets) and the
    size==1 + 64-bit largesize box encoding both decode — modern encoders
    emit v1 and >4GiB files use largesize (round-6 advisor flag)."""
    from feathub_spark.datapipe.multimodal import parse_video_header

    def be(n, w):
        return n.to_bytes(w, "big")

    mvhd = (be(120, 4) + b"mvhd" + bytes([1, 0, 0, 0]) + bytes(16)
            + be(1000, 4) + be(43210, 8) + bytes(80))
    tkhd = (be(104, 4) + b"tkhd" + bytes([1, 0, 0, 0]) + bytes(84)
            + be(320 << 16, 4) + be(240 << 16, 4))
    trak = be(112, 4) + b"trak" + tkhd
    moov = be(1, 4) + b"moov" + be(16 + len(mvhd) + len(trak), 8) + mvhd + trak
    ftyp = be(20, 4) + b"ftyp" + b"isom" + bytes(4) + b"isom"
    assert parse_video_header(ftyp + moov) == (320, 240, 43210, 1000, 1, "mp4")

    # unsupported future versions still error (never silently misparse)
    bad_mvhd = (be(120, 4) + b"mvhd" + bytes([2, 0, 0, 0]) + bytes(108))
    bad = ftyp + be(128, 4) + b"moov" + bad_mvhd
    with pytest.raises(ValueError, match="version"):
        parse_video_header(bad)
    # truncated largesize header errors
    with pytest.raises(ValueError, match="largesize"):
        parse_video_header(ftyp + be(1, 4) + b"moov" + bytes(4))


def test_decode_on_error_null_policy(spark):
    """on_error='null' emits NULL meta + the failure reason and KEEPS
    GOING; the default still fails fast; bogus values are rejected."""
    from feathub_spark.datapipe.multimodal import (
        decode_audio_metadata,
        decode_image_metadata,
        decode_video_metadata,
        resize_plan,
    )

    png = (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
           + (32).to_bytes(4, "big") + (16).to_bytes(4, "big")
           + bytes([8, 6, 0, 0, 0]))
    df = spark.createDataFrame(
        [(1, png), (2, b"definitely not an image"), (3, None)],
        "i long, payload binary",
    )
    out = {
        r["i"]: (r["image_meta"], r["image_meta_error"])
        for r in decode_image_metadata(
            df, "payload", on_error="null"
        ).collect()
    }
    assert out[1][0]["width"] == 32 and out[1][1] is None
    assert out[2][0] is None and "unrecognized" in out[2][1]
    assert out[3][0] is None and out[3][1] is not None
    # resize_plan honors the same policy
    rz = {
        r["i"]: (r["resize_meta"], r["resize_meta_error"])
        for r in resize_plan(
            df, "payload", 16, 16, on_error="null"
        ).collect()
    }
    assert rz[1][0]["dst_width"] == 16 and rz[2][0] is None and rz[2][1]
    # audio + video: same contract
    au = decode_audio_metadata(df, "payload", on_error="null").collect()
    assert all(r["audio_meta"] is None for r in au)
    vi = decode_video_metadata(df, "payload", on_error="null").collect()
    assert all(r["video_meta"] is None and r["video_meta_error"] for r in vi)
    # default remains fail-fast, and the error column is absent
    with pytest.raises(Exception, match="NotImplementedError|cannot decode"):
        decode_image_metadata(df, "payload").collect()
    assert "image_meta_error" not in decode_image_metadata(df, "payload").columns
    with pytest.raises(ValueError, match="on_error"):
        decode_image_metadata(df, "payload", on_error="skip")


def test_pq_encode_and_adc_matches_python_model(spark):
    """PQ codebook/encode/ADC against a direct python replay: same
    hash-rank codebook, same integer-micro-unit distances, same argmin
    tie-breaks."""
    import hashlib

    from feathub_spark.datapipe.similarity import pq_codebook, pq_encode, pq_topk

    import numpy as np

    rng = np.random.RandomState(7)
    vecs = {i: rng.randn(8).round(3).tolist() for i in range(30)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    m, n_codes, seed = 2, 4, 3

    def h32(v, s):
        return int(hashlib.md5(f"{v}:{s}".encode()).hexdigest()[:8], 16)

    sample = sorted(vecs, key=lambda i: (h32(i, seed), i))[:n_codes]
    # codebook: code c = c-th sampled vector, subspace j = dims [j*4, j*4+4)
    cb = {
        (j, c): vecs[sample[c]][j * 4 : (j + 1) * 4]
        for j in range(m) for c in range(n_codes)
    }

    def dmicro(a, b):
        return int(round(sum((x - y) * (x - y) for x, y in zip(a, b)) * 1e6))

    def encode(v):
        out = []
        for j in range(m):
            sub = v[j * 4 : (j + 1) * 4]
            best = min(range(n_codes), key=lambda c: (dmicro(sub, cb[(j, c)]), c))
            out.append(best)
        return out

    got_cb = {
        (r["sub"], r["code"]): r["subvec"]
        for r in pq_codebook(df, "embedding", "vec_id", m, n_codes, seed).collect()
    }
    assert got_cb == cb
    got_enc = {
        r["vec_id"]: r["pq_codes"]
        for r in pq_encode(df, "embedding", "vec_id", m, n_codes, seed).collect()
    }
    assert got_enc == {i: encode(v) for i, v in vecs.items()}

    # ADC top-k vs python model
    q_ids = [0, 1]
    expected = {}
    for q in q_ids:
        lut = {
            (j, c): dmicro(vecs[q][j * 4 : (j + 1) * 4], cb[(j, c)])
            for j in range(m) for c in range(n_codes)
        }
        scored = sorted(
            (
                (sum(lut[(j, got_enc[n][j])] for j in range(m)), n)
                for n in vecs if n != q
            )
        )[:3]
        expected[q] = [
            (n, r + 1, round(s / 1e6, 6)) for r, (s, n) in enumerate(scored)
        ]
    got = {}
    qdf = df.filter(F.col("vec_id") < 2)
    for r in pq_topk(
        df, qdf, "embedding", "vec_id", k=3, m=m, n_codes=n_codes, seed=seed
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["rank"], r["adc_dist"])
        )
    for q in q_ids:
        assert sorted(got[q], key=lambda t: t[1]) == expected[q]


def test_two_stage_topk_equals_single_window(spark):
    """The salted two-stage per-query top-k must return exactly the rows
    and ranks of a plain per-query window rank."""
    from pyspark.sql import Window

    from feathub_spark.datapipe.similarity import _two_stage_topk

    rows = [
        (q, n, float((q * 31 + n * 17) % 50))
        for q in range(3) for n in range(200)
    ]
    scored = spark.createDataFrame(rows, "query_id long, neighbor_id long, s double")
    order = [F.col("s").desc(), F.col("neighbor_id").asc()]
    w = Window.partitionBy("query_id").orderBy(*order)
    single = (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 7)
        .select("query_id", "neighbor_id", "rank")
    )
    two = _two_stage_topk(scored, 7, order).select(
        "query_id", "neighbor_id", "rank"
    )
    assert sorted(map(tuple, two.collect())) == sorted(map(tuple, single.collect()))


def test_ivf_pq_exhaustive_probe_equals_pq(spark):
    """With nprobe == n_centroids (every cell probed) IVF-PQ must return
    exactly the plain ADC scan's results — the cells only bound WHICH rows
    are scored, never the scores."""
    import numpy as np

    from feathub_spark.datapipe.similarity import ivf_pq_topk, pq_topk

    rng = np.random.RandomState(11)
    df = spark.createDataFrame(
        [(i, rng.randn(8).round(3).tolist()) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    q = df.filter(F.col("vec_id") < 3)
    kw = dict(k=4, m=2, n_codes=4, seed=3)
    full = sorted(map(tuple, pq_topk(df, q, "embedding", "vec_id", **kw).collect()))
    ivfpq = sorted(map(tuple, ivf_pq_topk(
        df, q, "embedding", "vec_id", n_centroids=6, nprobe=6, **kw
    ).collect()))
    assert ivfpq == full
    # restricted probes return a subset of the scored universe per query
    few = ivf_pq_topk(
        df, q, "embedding", "vec_id", n_centroids=6, nprobe=1, **kw
    ).collect()
    full_map = {(r[0], r[1]): r[3] for r in full}
    for r in few:
        # any returned pair that the full scan also ranked has the same dist
        if (r["query_id"], r["neighbor_id"]) in full_map:
            assert r["adc_dist"] == full_map[(r["query_id"], r["neighbor_id"])]


def test_bm25_search_matches_python_model(spark):
    import math
    from collections import Counter

    from feathub_spark.datapipe.retrieval import bm25_search

    corpus = {
        1: "apple banana apple cherry",
        2: "banana banana date",
        3: "cherry date elderberry fig grape",
        4: "apple apple apple apple",
        5: "",
    }
    df = spark.createDataFrame(list(corpus.items()), "doc_id long, text string")
    qdf = spark.createDataFrame(
        [(100, "apple banana"), (200, "date")],
        "query_id long, query_text string",
    )
    k1, b = 1.2, 0.75
    toks = {d: t.split() for d, t in corpus.items()}
    # Okapi: N and avgdl are CORPUS-wide — the empty doc 5 counts toward
    # both (len 0), it just can never match (review finding: deriving the
    # stats from token-bearing docs only deflated every idf)
    dls = {d: len(t) for d, t in toks.items()}
    N, avgdl = len(dls), sum(dls.values()) / len(dls)

    def score(q_terms, d):
        tf = Counter(toks[d])
        s = 0
        for t in set(q_terms):
            if tf[t] == 0:
                continue
            dfreq = sum(1 for dt in toks.values() if t in dt)
            idf = math.log((N - dfreq + 0.5) / (dfreq + 0.5) + 1)
            term = idf * (tf[t] * (k1 + 1)) / (
                tf[t] + k1 * (1 - b + b * dls[d] / avgdl)
            )
            s += int(round(term * 1e6))
        return round(s / 1e6, 6)

    expected = {}
    for qid, qt in ((100, ["apple", "banana"]), (200, ["date"])):
        ranked = sorted(
            ((score(qt, d), -d) for d in dls if score(qt, d) > 0), reverse=True
        )
        expected[qid] = [(-nd, r + 1, s) for r, (s, nd) in enumerate(ranked)][:3]

    got = {}
    for r in bm25_search(df, qdf, "text", "doc_id", k=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["rank"], r["bm25"])
        )
    for qid in expected:
        assert sorted(got[qid], key=lambda t: t[1]) == expected[qid], qid
    # empty doc never matches; doc without the term never matches
    assert all(d != 5 for lst in got.values() for d, _, _ in lst)


def test_rrf_fuse_matches_python_model(spark):
    from feathub_spark.datapipe.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
        "query_id long, item_id long, rank long",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (2, 20, 1), (2, 21, 2)],
        "query_id long, item_id long, rank long",
    )

    def r(rank):
        return int(round(1e9 / (60 + rank)))

    expected = {
        (1, 11): r(2) + r(1),          # in both lists -> wins
        (1, 10): r(1),
        (1, 12): r(3),
        (1, 13): r(2),
        (2, 20): r(1) + r(1),
        (2, 21): r(2),
    }
    got = {
        (x["query_id"], x["item_id"]): (x["rank"], x["rrf_score"])
        for x in rrf_fuse([a, b], k=10).collect()
    }
    assert set(got) == set(expected)
    for key, s in expected.items():
        assert abs(got[key][1] - round(s / 1e9, 9)) < 1e-12
    # the doubly-ranked item tops its query
    assert got[(1, 11)][0] == 1 and got[(2, 20)][0] == 1
    # k truncates
    assert {x["item_id"] for x in rrf_fuse([a, b], k=1).collect()} == {11, 20}


def test_semantic_dedup_keep_rule(spark):
    """Identical vectors in one cell: the member farther from the centroid
    (lower centroid cosine; ties by smaller id) survives, the other is
    dropped.  Unrelated vectors and sub-threshold neighbors are kept."""
    from feathub_spark.datapipe.similarity import semantic_dedup
    from feathub_spark.common.caching import release_caches

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),     # exact dup of 0 -> tie on ccos, id 0 wins
        (2, [0.9, 0.1, 0.0]),     # near dup of 0/1
        (3, [0.0, 1.0, 0.0]),     # unrelated
        (4, [0.0, 0.0, 1.0]),     # unrelated
    ]
    df = spark.createDataFrame(rows, ["vec_id", "vec"])
    out = {
        r.vec_id: r
        for r in semantic_dedup(
            df, "vec", "vec_id", threshold=0.999, n_centroids=2, seed=0
        ).collect()
    }
    release_caches()
    assert len(out) == 5  # one row per corpus row, kept flag attached
    assert out[2].kept and out[3].kept and out[4].kept
    # 0 and 1 are identical: same cell, equal centroid cosine, only the
    # (0, 1) pair clears the 0.999 threshold -> tie breaks to smaller id
    assert out[0].cell == out[1].cell
    assert out[0].centroid_cos == out[1].centroid_cos
    assert out[0].kept and not out[1].kept
    # at 0.95 the whole {0, 1, 2} neighborhood is mutually near-dup and the
    # member FARTHEST from the centroid (vec 2) is the sole survivor
    out95 = {
        r.vec_id: r.kept
        for r in semantic_dedup(
            df, "vec", "vec_id", threshold=0.95, n_centroids=2, seed=0
        ).collect()
    }
    release_caches()
    assert out95 == {0: False, 1: False, 2: True, 3: True, 4: True}
    # threshold above any attainable cosine -> nothing dropped
    all_kept = semantic_dedup(
        df, "vec", "vec_id", threshold=1.01, n_centroids=2, seed=0
    ).collect()
    release_caches()
    assert all(r.kept for r in all_kept)


def test_hll_distinct_accuracy_and_merge(spark):
    """HLL estimate lands within the ~3*1.04/sqrt(m) relative-error band
    on 5000 distinct values, and the register construction is mergeable:
    sketching two half-corpora and a groupBy-MAX merge yields the same
    registers (hence the same estimate) as sketching the union."""
    from feathub_spark.datapipe.profile import hll_distinct
    from pyspark.sql import functions as F

    df = spark.range(5000).select(
        F.lit("g").alias("g"), (F.col("id") * 7919 + 13).alias("v")
    )
    row = hll_distinct(df, "v", ["g"], p=8, seed=1).collect()[0]
    assert row.n_exact == 5000
    # m=256 -> standard error 1.04/16 = 6.5%; allow 3 sigma
    assert abs(row.rel_err) < 0.20
    # mergeability: union of shard sketches == whole-corpus sketch
    lo = df.filter(F.col("v") % 2 == 0)
    hi = df.filter(F.col("v") % 2 == 1)
    est_union = hll_distinct(df, "v", ["g"], p=8, seed=1).collect()[0]
    est_halves = hll_distinct(
        lo.unionByName(hi), "v", ["g"], p=8, seed=1
    ).collect()[0]
    assert est_union.hll_estimate == est_halves.hll_estimate
    assert est_union.n_registers == est_halves.n_registers


def test_hll_distinct_rejects_unaligned_p():
    import pytest as _pytest

    from feathub_spark.datapipe.profile import hll_distinct

    with _pytest.raises(ValueError):
        hll_distinct(None, "v", ["g"], p=10)


def test_cms_heavy_hitters_no_false_negatives(spark):
    """CMS never underestimates: every token whose true count reaches the
    threshold appears in the output, est_count >= exact_count everywhere,
    and sub-threshold tokens only sneak in via collisions (never with an
    inflated exact count)."""
    from feathub_spark.datapipe.profile import cms_heavy_hitters

    # skewed corpus: 'hot' 60x, 'warm' 20x, 30 singletons
    rows = (
        [("hot hot hot",)] * 20
        + [("warm",)] * 20
        + [(f"rare{i}",) for i in range(30)]
    )
    df = spark.createDataFrame(rows, ["text"])
    out = {
        r.token: (r.est_count, r.exact_count)
        for r in cms_heavy_hitters(
            df, "text", d=3, w=8, min_count=15, seed=2
        ).collect()
    }
    assert "hot" in out and "warm" in out
    assert out["hot"][1] == 60 and out["warm"][1] == 20
    for tok, (est, exact) in out.items():
        assert est >= exact
    # with a roomy sketch there are no collisions: est == exact and only
    # the two true heavy hitters survive
    clean = {
        r.token: (r.est_count, r.exact_count)
        for r in cms_heavy_hitters(
            df, "text", d=4, w=4096, min_count=15, seed=2
        ).collect()
    }
    assert clean == {"hot": (60, 60), "warm": (20, 20)}


def test_phrase_search_positions_and_repeats(spark):
    from feathub_spark.datapipe.retrieval import phrase_search

    rows = [
        (0, "the cat sat on the mat the cat sat"),
        (1, "cat the cat the cat"),
        (2, "dog park"),
        (3, "THE Cat  sat"),   # case + multi-space normalized
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, "text", "doc_id", "the cat sat").collect()
    }
    assert out == {0: (2, 0), 3: (1, 0)}
    # repeated phrase term: "the cat the" matches [cat, THE, cat, THE, cat]
    rep = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(df, "text", "doc_id", "the cat the").collect()
    }
    assert rep == {1: (1, 1)}
    # single-token phrase degenerates to term lookup with counts
    one = {
        r.doc_id: r.n_matches
        for r in phrase_search(df, "text", "doc_id", "cat").collect()
    }
    assert one == {0: 2, 1: 3, 3: 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        phrase_search(df, "text", "doc_id", "   ")


def test_diff_snapshots_change_classes(spark):
    from feathub_spark.datapipe.snapshots import diff_snapshots

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 30.0), (4, None, 40.0), (5, "e", 50.0)],
        ["k", "s", "v"],
    )
    out = {
        r.k: r for r in diff_snapshots(old, new, ["k"]).collect()
    }
    # 1 removed; 2 unchanged (absent); 3 NULL->30 changed; 4 d->NULL
    # changed; 5 added
    assert set(out) == {1, 3, 4, 5}
    assert out[1].change_type == "removed" and out[1].s_new is None
    assert out[3].change_type == "changed" and out[3].v_old is None
    assert out[3].v_new == 30.0
    assert out[4].change_type == "changed" and out[4].s_new is None
    assert out[5].change_type == "added" and out[5].s_old is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        diff_snapshots(old.select("k"), new.select("k"), ["k"])


def test_bloom_prune_no_false_negatives(spark):
    from feathub_spark.datapipe.bloom import bloom_filter_bits, bloom_prune

    keys = spark.range(200).select((F.col("id") * 3).alias("k"))
    bloom = bloom_filter_bits(keys, "k", m_bits=1 << 13, k=3, seed=5)
    probe = spark.range(1200).select(F.col("id").alias("k"))
    kept = {
        r.k
        for r in bloom_prune(
            probe, "k", bloom, m_bits=1 << 13, k=3, seed=5
        ).collect()
    }
    true_set = {i * 3 for i in range(200)}
    assert true_set <= kept          # NEVER a false negative
    assert len(kept - true_set) < 120  # FP fraction stays sketch-sized
    # a tiny filter degrades to false positives, never false negatives
    tiny = bloom_filter_bits(keys, "k", m_bits=64, k=2, seed=5)
    kept_tiny = {
        r.k
        for r in bloom_prune(
            probe, "k", tiny, m_bits=64, k=2, seed=5
        ).collect()
    }
    assert true_set <= kept_tiny


def test_tokenize_to_ids_arrow_matches_sql_join_model(spark):
    """The mapInArrow encode must equal the positional-explode +
    broadcast-join + regroup form it replaced, row for row, on the full
    fuzz alphabet — incl. final-sigma/dotted-I lowering, NULL text,
    whitespace-only text, and all-OOV documents."""
    import random

    from pyspark.sql import Window

    from feathub_spark.datapipe.text import tokenize_to_ids

    rnd = random.Random(78)
    alphabet = list("abc XYZ \t\n\x0b\f\r") + [
        "\xa0", " ", "İ", "ß", "ẞ", "Σ", "ΟΣ", "é", "漢", "🙂", "'",
        '"', "\\", "`", "0", ".",
    ]
    texts = [None, "", " ", "   ", "a", "a b", "\t\n", "\xa0", "ΣΑΣ ΟΣ Σ",
             "a b a b a b"]
    texts += [
        "".join(rnd.choice(alphabet) for _ in range(rnd.randrange(0, 60)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = "filter(split(trim(lower(`text`)), '\\\\s+'), t -> t <> '')"
    for vocab_size, min_count in ((5, 1), (50, 2)):
        occ = df.select(
            F.col("doc_id"),
            F.posexplode(F.expr(toks)).alias("__pos__", "__tok__"),
        )
        counts = (
            occ.groupBy("__tok__")
            .agg(F.count(F.lit(1)).alias("__c__"))
            .filter(F.col("__c__") >= F.lit(min_count))
        )
        cut = counts.orderBy(
            F.col("__c__").desc(), F.col("__tok__").asc()
        ).limit(vocab_size)
        w = Window.orderBy(F.col("__c__").desc(), F.col("__tok__").asc())
        vocab = cut.select(
            F.col("__tok__").alias("__vtok__"),
            F.row_number().over(w).cast("int").alias("__tid__"),
        )
        enc = occ.join(
            F.broadcast(vocab), occ.__tok__ == vocab.__vtok__, "left"
        ).select(
            "doc_id", "__pos__",
            F.coalesce(F.col("__tid__"), F.lit(0)).alias("__tid__"),
        )
        arrs = enc.groupBy("doc_id").agg(
            F.expr(
                "transform(array_sort(collect_list(struct(__pos__, "
                "__tid__))), s -> s.__tid__)"
            ).alias("token_ids"),
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.expr(
                "CAST(sum(CASE WHEN __tid__ = 0 THEN 1 ELSE 0 END) "
                "AS BIGINT)"
            ).alias("n_oov"),
        )
        want = {
            r.doc_id: (r.token_ids, r.n_tokens, r.n_oov)
            for r in df.select("doc_id")
            .join(arrs, on="doc_id", how="left")
            .select(
                "doc_id",
                F.coalesce(
                    F.col("token_ids"), F.expr("CAST(array() AS ARRAY<INT>)")
                ).alias("token_ids"),
                F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
                F.coalesce(F.col("n_oov"), F.lit(0)).alias("n_oov"),
            )
            .collect()
        }
        got = {
            r.doc_id: (r.token_ids, r.n_tokens, r.n_oov)
            for r in tokenize_to_ids(
                df, "text", "doc_id",
                vocab_size=vocab_size, min_count=min_count,
            ).collect()
        }
        assert got == want, (vocab_size, min_count)


def test_tokenize_to_ids_null_and_duplicate_ids_encode_per_row(spark):
    """Pin the two id corners the join-model conformance fuzz cannot
    cover (its regroup model reproduces the OLD merged behavior): a NULL
    id encodes its text normally with the NULL passed through (the old
    join form returned it empty — NULL never matched the left join), and
    duplicate ids each keep their own row/token stream."""
    from feathub_spark.datapipe.text import tokenize_to_ids

    df = spark.createDataFrame(
        [(None, "a b"), (1, "a a"), (1, "b"), (2, None)],
        "doc_id long, text string",
    )
    # corpus counts: a=3, b=2 -> vocab_size=2 keeps both: a->1, b->2
    got = sorted(
        (
            (r.doc_id, tuple(r.token_ids), r.n_tokens, r.n_oov)
            for r in tokenize_to_ids(
                df, "text", "doc_id", vocab_size=2
            ).collect()
        ),
        key=lambda t: (t[0] is None, t),
    )
    assert got == [
        (1, (1, 1), 2, 0),
        (1, (2,), 1, 0),
        (2, (), 0, 0),
        (None, (1, 2), 2, 0),
    ]


def test_tokenize_to_ids_vocab_and_oov(spark):
    from feathub_spark.datapipe.text import tokenize_to_ids

    df = spark.createDataFrame(
        [(0, "a b c a"), (1, "a x y"), (2, "B b q")], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in tokenize_to_ids(df, "text", "doc_id", vocab_size=3).collect()
    }
    # counts: a=3, b=3 (case-folded), then c/q/x/y=1 -> tie-break
    # alphabetical: a->1, b->2, c->3; rest OOV
    assert out[0].token_ids == [1, 2, 3, 1] and out[0].n_oov == 0
    assert out[1].token_ids == [1, 0, 0] and out[1].n_oov == 2
    assert out[2].token_ids == [2, 2, 0] and out[2].n_oov == 1
    assert out[1].n_tokens == 3
    # min_count prunes singletons out of the vocab entirely
    pruned = {
        r.doc_id: r.token_ids
        for r in tokenize_to_ids(
            df, "text", "doc_id", vocab_size=10, min_count=2
        ).collect()
    }
    assert pruned[0] == [1, 2, 0, 1]


def test_key_skew_hot_key_report(spark):
    from feathub_spark.datapipe.profile import key_skew

    rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, ["k"])
    out = key_skew(df, "k", top_k=3).orderBy("rank").collect()
    assert [r.key for r in out] == ["hot", "k0", "k1"]
    assert out[0].n == 90 and out[0].share == 0.9
    assert out[0].n_rows == 100 and out[0].n_keys == 11
    # skew_factor = max / mean = 90 / (100/11)
    assert out[0].skew_factor == round(90 * 11 / 100, 4)


def test_mmr_rerank_golden_and_diversity(spark):
    """Golden check vs an independent in-test greedy implementation, plus
    the semantic property: lam=1 is pure relevance order, and at
    moderate lam an exact duplicate of the top hit is demoted below a
    less-relevant-but-novel item."""
    import math
    import random

    from feathub_spark.datapipe.retrieval import mmr_rerank

    rnd = random.Random(7)
    rows = []
    vecs = {}
    for q in range(3):
        for i in range(8):
            v = [rnd.gauss(0, 1) for _ in range(8)]
            vecs[(q, i)] = v
            rows.append((q, i, round(rnd.random(), 3), v))
    df = spark.createDataFrame(rows, ["query_id", "item_id", "rel", "vec"])

    def golden(q, k, lam):
        cands = [(i, r, v) for (qq, i, r, v) in
                 [(row[0], row[1], row[2], row[3]) for row in rows] if qq == q]
        def unit(v):
            n = math.sqrt(sum(x * x for x in v)) or 1.0
            return [x / n for x in v]
        cands = [(i, r, unit(v)) for i, r, v in cands]
        sel, rem, out = [], list(range(len(cands))), []
        while rem and len(sel) < k:
            best, bs = None, None
            for ix in rem:
                i, r, v = cands[ix]
                pen = max((sum(a * b for a, b in zip(v, cands[jx][2]))
                           for jx in sel), default=0.0)
                s = round(lam * r - (1 - lam) * pen, 6)
                if best is None or s > bs or (s == bs and i < cands[best][0]):
                    best, bs = ix, s
            sel.append(best)
            rem.remove(best)
            out.append((cands[best][0], len(sel), bs))
        return out

    got = mmr_rerank(df, "query_id", "item_id", "rel", "vec",
                     k=4, lam=0.6).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(
            (r.item_id, r.mmr_rank, r.mmr_score))
    for q in range(3):
        assert sorted(by_q[q], key=lambda t: t[1]) == golden(q, 4, 0.6)

    # duplicate demotion: item 1 is an exact copy of top item 0
    dup = spark.createDataFrame(
        [
            (0, 0, 1.0, [1.0, 0.0]),
            (0, 1, 0.99, [1.0, 0.0]),   # duplicate of 0, almost as relevant
            (0, 2, 0.30, [0.0, 1.0]),   # novel
        ],
        ["query_id", "item_id", "rel", "vec"],
    )
    order = [r.item_id for r in sorted(
        mmr_rerank(dup, "query_id", "item_id", "rel", "vec",
                   k=3, lam=0.5).collect(),
        key=lambda r: r.mmr_rank)]
    assert order == [0, 2, 1]
    # lam=1 -> pure relevance
    order_rel = [r.item_id for r in sorted(
        mmr_rerank(dup, "query_id", "item_id", "rel", "vec",
                   k=3, lam=1.0).collect(),
        key=lambda r: r.mmr_rank)]
    assert order_rel == [0, 1, 2]


def test_parse_json_features_permissive(spark):
    from feathub_spark.datapipe.text import parse_json_features

    df = spark.createDataFrame(
        [
            (1, '{"k": 5, "tag": "a", "nested": {"x": 1.5}}'),
            (2, '{"k": 7}'),
            (3, "not json"),
            (4, None),
            (5, '{"k": "wrongtype"}'),
        ],
        ["id", "props"],
    )
    out = {
        r.id: r
        for r in parse_json_features(
            df, "props", "k BIGINT, tag STRING, nested STRUCT<x: DOUBLE>",
            prefix="p_",
        ).collect()
    }
    assert out[1].p_k == 5 and out[1].p_tag == "a" and out[1].p_nested.x == 1.5
    assert out[2].p_k == 7 and out[2].p_tag is None
    assert out[3].p_k is None          # malformed -> NULL, row survives
    assert out[4].p_k is None          # NULL payload
    assert out[5].p_k is None          # type mismatch -> NULL
    assert "props" in out[1].asDict()  # input passes through


def test_lsh_multiprobe_recall_superset(spark):
    """Multi-probe candidates are a strict superset of the home-bucket
    candidates (same index), so per-query results can only improve."""
    import math
    import random

    from feathub_spark.datapipe.similarity import lsh_topk

    rnd = random.Random(3)
    dims = 16

    def vec(seed_vec=None, noise=0.0):
        v = (
            [rnd.gauss(0, 1) for _ in range(dims)]
            if seed_vec is None
            else [x + rnd.gauss(0, noise) for x in seed_vec]
        )
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    base = vec()
    rows = [(0, base)] + [(i, vec(base, 0.08)) for i in range(1, 5)] + [
        (i, vec()) for i in range(5, 60)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter(F.col("vec_id") == 0)
    plain = {
        r.neighbor_id
        for r in lsh_topk(
            df, q, "embedding", "vec_id", k=10, planes=16, bands=2, dims=dims
        ).collect()
    }
    multi = {
        r.neighbor_id
        for r in lsh_topk(
            df, q, "embedding", "vec_id", k=10, planes=16, bands=2,
            dims=dims, query_probes=8,
        ).collect()
    }
    assert plain <= multi          # same index, more probes -> superset
    assert multi & {1, 2, 3, 4}    # finds the planted near-duplicates


def test_pagerank_integer_exact(spark):
    """Star hub outranks leaves; disconnected pair keeps unit mass; a
    Python integer replica reproduces every unit exactly."""
    from feathub_spark.datapipe.graph import pagerank

    pairs = [(0, i) for i in range(1, 5)] + [(5, 6)]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {r.id: r.rank_units for r in pagerank(df, iterations=3).collect()}

    # exact integer replica
    edges = set()
    for a, b in pairs:
        edges.add((a, b))
        edges.add((b, a))
    nodes = {n for e in edges for n in e}
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        inc = {n: 0 for n in nodes}
        for s, d in edges:
            inc[d] += r[s] // deg[s]
        r = {n: 150_000 + (85 * inc[n]) // 100 for n in nodes}
    assert got == r
    assert got[0] > got[1]          # hub dominates
    assert got[5] == got[6] == 1_000_000
    import pytest as _pytest

    with _pytest.raises(ValueError):
        pagerank(df, damping_pct=0)


def test_pagerank_directed_sink_handling(spark):
    """Directed chain 0->1->2: under "leak" the sink (2) discards its own
    mass each round; "self_loop" adds 2->2 so it keeps the damped share.
    Both checked against exact integer replicas."""
    from feathub_spark.datapipe.graph import pagerank

    import pytest as _pytest

    df = spark.createDataFrame([(0, 1), (1, 2)], ["id_a", "id_b"])

    def replica(edges, iters=3):
        nodes = {n for e in edges for n in e}
        deg = {}
        for s, _ in edges:
            deg[s] = deg.get(s, 0) + 1
        r = {n: 1_000_000 for n in nodes}
        for _ in range(iters):
            inc = {n: 0 for n in nodes}
            for s, d in edges:
                inc[d] += r[s] // deg[s]
            r = {n: 150_000 + (85 * inc[n]) // 100 for n in nodes}
        return r

    leak = {
        r.id: r.rank_units
        for r in pagerank(df, iterations=3, directed=True).collect()
    }
    assert leak == replica([(0, 1), (1, 2)])

    looped = {
        r.id: r.rank_units
        for r in pagerank(
            df, iterations=3, directed=True, handle_sinks="self_loop"
        ).collect()
    }
    assert looped == replica([(0, 1), (1, 2), (2, 2)])
    assert looped[2] > leak[2]  # the sink now retains damped self-mass

    with _pytest.raises(ValueError):
        pagerank(df, directed=True, handle_sinks="bounce")


def test_token_pmi_collocations(spark):
    import math

    from feathub_spark.datapipe.text import token_pmi

    rows = [("new york is nice",)] * 4 + [("york new haven",)] * 2
    df = spark.createDataFrame(rows, ["text"])
    out = {r.gram: r for r in token_pmi(df, "text", min_count=2).collect()}
    # 'new york' occurs 4x; uni: new=6, york=6; bigrams total 4*3+2*2=16
    r = out["new york"]
    assert r.n_pair == 4
    expect = math.log2((4 / 16) / ((6 / 22) * (6 / 22)))
    assert abs(r.pmi - round(expect, 6)) < 1e-6
    # min_count suppresses singletons entirely
    assert all(v.n_pair >= 2 for v in out.values())
    # ranks are dense from 1
    assert sorted(v.rank for v in out.values()) == list(
        range(1, len(out) + 1)
    )


def test_merge_aggregates_equals_recompute(spark):
    import random

    from feathub_spark.datapipe.snapshots import merge_aggregates

    rnd = random.Random(9)
    rows = [
        (f"k{rnd.randrange(8)}", rnd.randrange(-50, 100)) for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "k string, v long")
    specs = {
        "n": ("count", "v"),
        "s": ("sum", "v"),
        "mn": ("min", "v"),
        "mx": ("max", "v"),
    }
    full = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count("v").alias("n"), F.sum("v").alias("s"),
            F.min("v").alias("mn"), F.max("v").alias("mx"),
        )
        .collect()
    }
    hist = df.filter("v % 3 != 0")
    delta = df.filter("v % 3 = 0")
    prev = hist.groupBy("k").agg(
        F.count("v").alias("n"), F.sum("v").alias("s"),
        F.min("v").alias("mn"), F.max("v").alias("mx"),
    )
    merged = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in merge_aggregates(prev, delta, ["k"], specs).collect()
    }
    assert merged == full
    # delta-only keys appear; history-only keys survive untouched
    prev2 = spark.createDataFrame(
        [("old", 2, 10, 1, 9)], "k string, n long, s long, mn long, mx long"
    )
    d2 = spark.createDataFrame([("new", 5)], "k string, v long")
    out = {
        r.k: (r.n, r.s, r.mn, r.mx)
        for r in merge_aggregates(prev2, d2, ["k"], specs).collect()
    }
    assert out == {"old": (2, 10, 1, 9), "new": (1, 5, 5, 5)}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        merge_aggregates(prev2, d2, ["k"], {"a": ("avg", "v")})


def test_approx_quantiles_exact_at_full_accuracy(spark):
    """With accuracy >= row count the GK sketch is exact and must equal
    the discrete quantile (element at rank ceil(p*n)) — globally and per
    group; at scale the same plan degrades to the rank-error bound."""
    import math

    from feathub_spark.datapipe.profile import approx_quantiles

    vals = [(g, float(v)) for g in ("a", "b")
            for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 97, 7][: 12 if g == "a" else 14]]
    df = spark.createDataFrame(vals, "g string, v double").repartition(5)
    probs = [0.1, 0.5, 0.9]

    def disc(data, p):
        s = sorted(data)
        return s[max(int(math.ceil(p * len(s))) - 1, 0)]

    got = {
        (r["column"], r["prob"]): r["value"]
        for r in approx_quantiles(df, ["v"], probs, accuracy=100000).collect()
    }
    allv = [v for _, v in vals]
    for p in probs:
        assert got[("v", p)] == disc(allv, p), p

    grouped = {
        (r["g"], r["prob"]): r["value"]
        for r in approx_quantiles(
            df, ["v"], probs, accuracy=100000, by=["g"]
        ).collect()
    }
    for g in ("a", "b"):
        data = [v for gg, v in vals if gg == g]
        for p in probs:
            assert grouped[(g, p)] == disc(data, p), (g, p)


def test_exact_quantiles_matches_discrete_rank_rule(spark):
    """exact_quantiles must return the element at 1-based rank
    max(1, ceil(p*n)) — the quantile_disc rule — for random data with
    duplicates, at the edges p=0/p=1, on a constant column, and per
    group; exactness comes from rank arithmetic (two-level prefix sums
    over deterministic value buckets), not from a sketch, so there is no
    accuracy knob to outgrow."""
    import math
    import random

    from feathub_spark.datapipe.profile import exact_quantiles

    rng = random.Random(31)

    def disc(data, p):
        s = sorted(data)
        return s[max(int(math.ceil(p * len(s))) - 1, 0)]

    probs = [0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0]
    # n=400 and n=100 make p*n land exactly on integers (the float-ceil
    # edge); duplicates exercise the [lo, hi] rank-interval cover
    for n in (1, 4, 100, 400, 97):
        data = [round(rng.uniform(-50, 50), 2) for _ in range(n)]
        data += data[: n // 3]
        df = spark.createDataFrame(
            [(v, v * 2) for v in data], "a double, b double"
        ).repartition(5)
        got = {
            (r["column"], r["prob"]): r["value"]
            for r in exact_quantiles(df, ["a", "b"], probs).collect()
        }
        for p in probs:
            assert got[("a", p)] == disc(data, p), (n, p)
            assert got[("b", p)] == disc([v * 2 for v in data], p), (n, p)

    # constant column (bucket width 0), NULL handling, and NaN exclusion
    # (Spark orders NaN as the largest double; quantiles drop it like
    # NULL for DuckDB quantile_disc parity — p=1.0 must NOT return NaN)
    cdf = spark.createDataFrame(
        [(7.0,)] * 5 + [(None,)] * 3 + [(float("nan"),)] * 2, "a double"
    )
    cgot = {
        r["prob"]: r["value"]
        for r in exact_quantiles(cdf, ["a"], [0.1, 0.9, 1.0]).collect()
    }
    assert cgot == {0.1: 7.0, 0.9: 7.0, 1.0: 7.0}

    # grouped path: ranks are per (group, column)
    rows = [("x", float(v)) for v in range(1, 9)] + [
        ("y", float(v)) for v in range(1, 12)
    ]
    gdf = spark.createDataFrame(rows, "g string, a double").repartition(4)
    ggot = {
        (r["g"], r["prob"]): r["value"]
        for r in exact_quantiles(gdf, ["a"], [0.5, 0.9], by=["g"]).collect()
    }
    for g in ("x", "y"):
        data = [v for gg, v in rows if gg == g]
        for p in (0.5, 0.9):
            assert ggot[(g, p)] == disc(data, p), (g, p)


def test_exact_quantiles_all_null_column_surfaces_null_rows(spark):
    """Contract parity with approx_quantiles: a column whose values are all
    NULL must surface as (column, prob, NULL) rows instead of silently
    vanishing from the report — ungrouped AND per-group (incl. a NULL group
    key, which groupBy treats as a real group).  NaN is where the two
    deliberately differ: exact_quantiles excludes NaN like NULL (its
    documented rank rule), while approx_quantiles rides percentile_approx,
    for which NaN is a real value sorting above everything — that pinned
    oracle semantics must NOT change, so the NaN case is exact-only."""
    from feathub_spark.datapipe.profile import approx_quantiles, exact_quantiles

    probs = [0.5, 0.9]
    df = spark.createDataFrame(
        [(1.0, None), (2.0, None), (3.0, None)], "a double, b double"
    )
    for fn in (exact_quantiles, approx_quantiles):
        got = {(r["column"], r["prob"]): r["value"] for r in fn(df, ["a", "b"], probs).collect()}
        assert set(got) == {("a", p) for p in probs} | {("b", p) for p in probs}, fn
        assert all(got[("b", p)] is None for p in probs), fn
        assert all(got[("a", p)] is not None for p in probs), fn

    # exact-only: a column that is NULL-except-NaN also surfaces NULL rows
    # (exact_quantiles filters NaN out with the NULLs)
    ndf = spark.createDataFrame(
        [(1.0, None), (2.0, float("nan"))], "a double, b double"
    )
    ngot = {
        (r["column"], r["prob"]): r["value"]
        for r in exact_quantiles(ndf, ["a", "b"], probs).collect()
    }
    assert set(ngot) == {(c, p) for c in ("a", "b") for p in probs}
    assert all(ngot[("b", p)] is None for p in probs)

    gdf = spark.createDataFrame(
        [("x", 1.0), ("x", 2.0), ("y", None), (None, None), (None, 4.0)],
        "g string, a double",
    )
    for fn in (exact_quantiles, approx_quantiles):
        got = {
            (r["g"], r["prob"]): r["value"]
            for r in fn(gdf, ["a"], probs, by=["g"]).collect()
        }
        # group y is all-NULL -> NULL rows; groups x and NULL have values
        assert set(got) == {(g, p) for g in ("x", "y", None) for p in probs}, fn
        assert all(got[("y", p)] is None for p in probs), fn
        assert all(got[("x", p)] is not None for p in probs), fn
        assert all(got[(None, p)] == 4.0 for p in probs), fn


def test_exact_quantiles_max_distinct_guard(spark):
    """The continuous-domain guard: with ``max_distinct`` set, a
    high-cardinality column (distinct ~ rows — the case whose exact rank
    path would shuffle a row-count-sized value table) routes through the
    approx_quantiles sketch, a bounded-domain column stays exact, and
    ``on_exceed='raise'`` names the offending column with the
    approx_quantiles guidance.  ``max_distinct=None`` (the default, used
    by every declared query) skips the probe entirely — pinned by the
    unguarded tests above staying byte-identical."""
    from feathub_spark.datapipe.profile import exact_quantiles

    n = 100_000
    df = spark.range(n).select(
        (F.col("id") * 1.000001).alias("a"),  # ~n distinct: continuous
        (F.col("id") % 10).cast("double").alias("b"),  # bounded domain
    )
    got = {
        (r["column"], r["prob"]): r["value"]
        for r in exact_quantiles(
            df, ["a", "b"], [0.5], max_distinct=1000
        ).collect()
    }
    # bounded column: exact rank rule, rank ceil(0.5*n) = 50000 -> 4.0
    assert got[("b", 0.5)] == 4.0
    # continuous column: sketch path, rank error <= n / accuracy = 10
    true_median = 49999 * 1.000001
    assert abs(got[("a", 0.5)] - true_median) <= 15 * 1.000001

    with pytest.raises(ValueError, match="'a'"):
        exact_quantiles(
            df, ["a", "b"], [0.5], max_distinct=1000, on_exceed="raise"
        )
    # the bounded column alone passes the probe even in raise mode
    ok = {
        r["prob"]: r["value"]
        for r in exact_quantiles(
            df, ["b"], [0.5], max_distinct=1000, on_exceed="raise"
        ).collect()
    }
    assert ok == {0.5: 4.0}


def test_quantize_embeddings_and_quantized_topk(spark):
    """int8 quantization semantics (per-vector scale, zero-vector code,
    tinyint range) and integer-cosine top-k agreement with the exact
    float ranking on well-separated vectors."""
    from pyspark.sql import functions as F

    from feathub_spark.datapipe.similarity import (
        brute_force_topk,
        quantize_embeddings,
        quantized_topk,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.95, 0.05, 0.0]),  # near 2
        (4, [0.0, 0.0, 0.0, 0.0]),    # zero vector
        (5, [-0.5, -0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    dq = quantize_embeddings(df, "embedding")
    got = {r.vec_id: r for r in dq.collect()}
    assert got[0].qvec == [127, 0, 0, 0]
    assert abs(got[0].qscale - 1.0 / 127) < 1e-12
    assert got[4].qscale == 0.0 and got[4].qvec == [0, 0, 0, 0]
    assert all(-127 <= x <= 127 for r in got.values() for x in r.qvec)
    # scale round-trips: dequantized max |error| <= scale/2
    for r in got.values():
        orig = dict(rows)[r.vec_id]
        for o, q in zip(orig, r.qvec):
            assert abs(o - q * r.qscale) <= r.qscale / 2 + 1e-12

    qs = dq.filter(F.col("vec_id").isin(0, 2))
    top = {
        (r.query_id, r.rank): r.neighbor_id
        for r in quantized_topk(dq, qs, "qvec", "vec_id", k=2).collect()
    }
    assert top[(0, 1)] == 1 and top[(2, 1)] == 3
    # zero vector never appears (NULL cosine dropped)
    assert 4 not in set(top.values())
    # matches the exact float ranking on this well-separated fixture
    exact = {
        (r.query_id, r.rank): r.neighbor_id
        for r in brute_force_topk(
            df, df.filter(F.col("vec_id").isin(0, 2)), "embedding", "vec_id", k=2
        ).collect()
    }
    assert top == exact


def test_binarize_and_hamming_topk(spark):
    """63-bit word packing round-trip, exact Hamming counts, and the
    prefilter+rerank composition finding the true nearest neighbor."""
    from pyspark.sql import functions as F

    from feathub_spark.datapipe.similarity import (
        binarize_embeddings,
        binary_rerank_topk,
        hamming_topk,
    )

    # 70 dims forces 2 words (63 + 7)
    def vec(bits):
        return [1.0 if i in bits else -1.0 for i in range(70)]

    rows = [
        (0, vec({0, 62, 63, 69})),
        (1, vec({0, 62, 63})),        # Hamming 1 from 0
        (2, vec({5})),                # far
        (3, vec(set(range(70)))),     # all positive
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    db = binarize_embeddings(df, "embedding")
    got = {r.vec_id: list(r.bvec) for r in db.collect()}
    assert len(got[0]) == 2
    assert got[0][0] == (1 << 0) | (1 << 62)          # dims 0,62 in word 0
    assert got[0][1] == (1 << 0) | (1 << 6)           # dims 63,69 -> bits 0,6
    assert got[3] == [(1 << 63) - 1, (1 << 7) - 1]    # 63 + 7 bits set
    assert all(w >= 0 for ws in got.values() for w in ws)  # sign bit clear

    top = {
        (r.query_id, r.rank): (r.neighbor_id, r.hamming)
        for r in hamming_topk(
            db, db.filter(F.col("vec_id") == 0), "bvec", "vec_id", k=3
        ).collect()
    }
    assert top[(0, 1)] == (1, 1)     # vec 1 differs only in dim 69
    assert top[(0, 2)] == (2, 5)     # vec 2: symmetric diff {0,5,62,63,69}
    assert top[(0, 3)] == (3, 66)    # all-ones differs in the other 66 dims

    rer = binary_rerank_topk(
        df, df.filter(F.col("vec_id") == 0), "embedding", "vec_id",
        k=1, expand=3,
    ).collect()
    assert [(r.query_id, r.neighbor_id, r.rank) for r in rer] == [(0, 1, 1)]


def test_fuzzy_match_pairs(spark):
    """Blocking recall contract, length-band prune, hot-block cap, and
    exact Levenshtein confirmation."""
    from feathub_spark.datapipe.dedup import fuzzy_match_pairs

    df = spark.createDataFrame(
        [
            (1, "jon smith"), (2, "john smith"),       # d=1, same block
            (3, "jane smith"),                          # d(2)=3: too far
            (4, "bob jones"), (5, "rob jones"),         # d=1
            (6, "completely different"),
        ],
        "id long, name string",
    )
    got = {
        (r.id_a, r.id_b, r.distance)
        for r in fuzzy_match_pairs(
            df, "name", "id", max_distance=1,
            block_expr="element_at(split(name, ' '), -1)",
        ).collect()
    }
    assert got == {(1, 2, 1), (4, 5, 1)}

    # default prefix blocking misses the jon/john pair? no — same 4-prefix
    # "jon " vs "john": differs -> blocked apart (the documented trade)
    pre = {
        (r.id_a, r.id_b)
        for r in fuzzy_match_pairs(df, "name", "id", max_distance=1).collect()
    }
    assert (1, 2) not in pre

    # hot-block cap drops the whole block (recall, never precision):
    # "smith" holds 3 rows > cap 2, so its pair disappears; "jones" stays
    capped = fuzzy_match_pairs(
        df, "name", "id", max_distance=1,
        block_expr="element_at(split(name, ' '), -1)",
        max_block_size=2,
    ).collect()
    assert {(r.id_a, r.id_b) for r in capped} == {(4, 5)}
    big = fuzzy_match_pairs(
        df, "name", "id", max_distance=1,
        block_expr="element_at(split(name, ' '), -1)",
        max_block_size=1,
    ).collect()
    assert big == []


def test_cohort_retention_and_attribution_golden(spark):
    from feathub_spark.datapipe.sessions import (
        attribute_conversions,
        cohort_retention,
    )

    df = spark.createDataFrame(
        [(1, 5), (1, 15), (2, 7), (3, 12), (3, 25)], "k long, ts long"
    )
    got = {
        (r.cohort_period, r.period_offset): (r.n_active, r.n_cohort,
                                             r.retention_rate)
        for r in cohort_retention(df, "k", "ts", 10).collect()
    }
    assert got == {
        (0, 0): (2, 2, 1.0),   # u1, u2 first-seen in period 0
        (0, 1): (1, 2, 0.5),   # only u1 returns in period 1
        (1, 0): (1, 1, 1.0),   # u3's own cohort
        (1, 1): (1, 1, 1.0),
    }

    ev = spark.createDataFrame(
        [
            (1, 100, "click"), (1, 200, "purchase"), (1, 300, "purchase"),
            (2, 50, "purchase"),                       # never touched
            (3, 10, "click"), (3, 500, "purchase"),    # lag 490
        ],
        "k long, ts long, tp string",
    )
    args = (ev, "k", "ts", "tp = 'purchase'", "tp = 'click'")
    rows = {
        (r.k, r.conversion_ts_us): (r.touch_ts_us, r.lag_us)
        for r in attribute_conversions(*args).collect()
    }
    assert rows == {
        (1, 200): (100, 100), (1, 300): (100, 200),
        (2, 50): (None, None), (3, 500): (10, 490),
    }
    # lookback bounds attribution but keeps the conversion row
    capped = {
        (r.k, r.conversion_ts_us): (r.touch_ts_us, r.lag_us)
        for r in attribute_conversions(*args, lookback_us=200).collect()
    }
    assert capped[(3, 500)] == (None, None)
    assert capped[(1, 300)] == (100, 200)


def test_transition_matrix_and_target_encode_golden(spark):
    from feathub_spark.datapipe.encode import target_encode
    from feathub_spark.datapipe.sessions import transition_matrix

    ev = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "a"), (2, 1, "a"), (2, 2, "b")],
        "k long, ts long, s string",
    )
    got = {
        (r.from_state, r.to_state): (r.n, r.p)
        for r in transition_matrix(ev, "k", "ts", "s").collect()
    }
    # a->b twice (both users), b->a once (user 1); rows normalize per source
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}

    df = spark.createDataFrame(
        [("x", 1.0), ("x", 2.0), ("x", 3.0), ("y", 10.0), (None, 5.0)],
        "c string, y double",
    )
    enc = {
        (r.c, r.y): r.c_te
        for r in target_encode(df, "c", "y", smoothing=1.0).collect()
    }
    # global mean over non-null-cat rows = (1+2+3+10)/4 = 4
    assert enc[("x", 1.0)] == 3.0          # (6-1 + 4)/(3-1+1)
    assert enc[("y", 10.0)] == 4.0         # single row -> pure prior
    assert enc[(None, 5.0)] == 4.0         # null category -> global mean
    # no leakage: the encoded value never equals the row's own target
    # when it is the category's only member
    assert enc[("y", 10.0)] != 10.0


def test_fuzzy_match_randomized_vs_python_model(spark):
    """Randomized strings vs a first-principles Python Levenshtein +
    blocking model (the operator's thresholded-distance path never gets
    to grade itself)."""
    import random

    from feathub_spark.datapipe.dedup import fuzzy_match_pairs

    def lev(a, b):
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                            prev + (a[i - 1] != b[j - 1]))
                prev = cur
        return dp[n]

    rnd = random.Random(17)
    alpha = "abcd"
    rows = [
        (i, "".join(rnd.choice(alpha) for _ in range(rnd.randrange(3, 9))))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    for d in (1, 2):
        got = {
            (r.id_a, r.id_b, r.distance)
            for r in fuzzy_match_pairs(
                df, "s", "id", max_distance=d,
                block_expr="substring(s, 1, 1)",
            ).collect()
        }
        want = {
            (a_id, b_id, lev(a, b))
            for a_id, a in rows
            for b_id, b in rows
            if a_id < b_id and a[:1] == b[:1]
            and abs(len(a) - len(b)) <= d and lev(a, b) <= d
        }
        assert got == want, f"max_distance={d}"


def test_attribution_randomized_vs_python_model(spark):
    import random

    from feathub_spark.datapipe.sessions import attribute_conversions

    rnd = random.Random(29)
    rows, used = [], set()
    for i in range(300):
        k, t = rnd.randrange(10), rnd.randrange(1, 1000)
        while (k, t) in used:
            t = rnd.randrange(1, 1000)
        used.add((k, t))
        rows.append((k, t, rnd.choice(["touch", "conv", "other"])))
    df = spark.createDataFrame(rows, "k long, ts long, tp string")

    def model(lookback):
        by_key = {}
        for k, t, tp in rows:
            by_key.setdefault(k, []).append((t, tp))
        out = {}
        for k, evs in by_key.items():
            evs.sort()
            last = None
            for t, tp in evs:
                if tp == "touch":
                    last = t
                if tp == "conv":
                    ok = last is not None and (
                        lookback is None or t - last <= lookback
                    )
                    out[(k, t)] = (last, t - last) if ok else (None, None)
        return out

    for lb in (None, 100):
        got = {
            (r.k, r.conversion_ts_us): (r.touch_ts_us, r.lag_us)
            for r in attribute_conversions(
                df, "k", "ts", "tp = 'conv'", "tp = 'touch'", lookback_us=lb
            ).collect()
        }
        assert got == model(lb), f"lookback={lb}"


def test_strip_html_semantics(spark):
    from feathub_spark.datapipe.text import strip_html

    df = spark.createDataFrame(
        [
            (1, "<html><head><style>p{color:red}</style>"
                "<script>var x=1;</script></head><body><h1>Title</h1>"
                "<p>Hello &amp; welcome to <b>the</b> page.</p>"
                "<p>Second&nbsp;para &lt;tag&gt; &#39;q&#39;</p>"
                "<!-- hidden --></body></html>"),
            (2, None),
            (3, "no markup at all"),
            # double-encoded entities stay literal (&amp; decodes LAST)
            (4, "&amp;lt;script&amp;gt; stays literal"),
            (5, "a<br>b<br/>c"),
        ],
        "doc_id long, text string",
    )
    out = strip_html(df, "text", "doc_id")
    got = {r.doc_id: r.clean_text for r in out.collect()}
    assert got[1] == ("Title\nHello & welcome to the page.\n"
                      "Second para <tag> 'q'")
    assert got[2] is None
    assert got[3] == "no markup at all"
    assert got[4] == "&lt;script&gt; stays literal"
    assert got[5] == "a\nb\nc"
    # zero shuffle: pure per-row projection
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_gemm_arrow_path_matches_sql(spark):
    """impl='arrow' (salt-grouped numpy GEMM) must match the SQL fold:
    int64 quantized scoring bit-identically; float scoring identically on
    this fixture (pairwise vs sequential accumulation can only diverge
    on last-ulp near-ties)."""
    from pyspark.sql import functions as F

    from feathub_spark.datapipe.similarity import (
        brute_force_topk,
        quantize_embeddings,
        quantized_topk,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = df.filter(F.col("vec_id") < 10)

    a = {(r.query_id, r.rank): (r.neighbor_id, r.cosine)
         for r in brute_force_topk(df, qs, "embedding", "vec_id", k=5).collect()}
    b = {(r.query_id, r.rank): (r.neighbor_id, r.cosine)
         for r in brute_force_topk(df, qs, "embedding", "vec_id", k=5,
                                   impl="arrow").collect()}
    assert a == b

    dq = quantize_embeddings(df, "embedding")
    qq = dq.filter(F.col("vec_id") < 10)
    qa = {(r.query_id, r.rank): (r.neighbor_id, r.cosine)
          for r in quantized_topk(dq, qq, "qvec", "vec_id", k=5).collect()}
    qb = {(r.query_id, r.rank): (r.neighbor_id, r.cosine)
          for r in quantized_topk(dq, qq, "qvec", "vec_id", k=5,
                                  impl="arrow").collect()}
    assert qa == qb


def test_gemm_arrow_self_crowding_and_ties(spark):
    """Round-8 advisor regressions for the GEMM path.

    (a) Self-crowding: with n_salts=1 every true neighbor shares the salt
    group with the query's own corpus row; the self row must be dropped
    BEFORE local truncation or it evicts the true k-th neighbor and the
    'exact top-k' contract breaks.
    (b) Tie determinism: duplicated vectors produce exact score ties; the
    local cut must keep the LOWEST neighbor ids (the global window's
    composite order), not argpartition-arbitrary members.
    """
    from pyspark.sql import functions as F

    from feathub_spark.datapipe.similarity import (
        _gemm_scored_topk,
        hamming_topk,
        quantize_embeddings,
        quantized_topk,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    dq = quantize_embeddings(df, "embedding")
    qq = dq.filter(F.col("vec_id") < 6)

    sql = {(r.query_id, r.rank): (r.neighbor_id, r.cosine)
           for r in quantized_topk(dq, qq, "qvec", "vec_id", k=5).collect()}
    one_salt = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in _gemm_scored_topk(
            dq.select("vec_id", "qvec"), qq.select("vec_id", "qvec"),
            "qvec", "vec_id", 5, "vec_id", integer=True, n_salts=1,
        ).collect()
    }
    assert sql == one_salt

    # (b) 40 rows, 4 distinct bit patterns -> dense exact-distance ties
    pats = [[0, 0], [3, 0], [0, 7], [15, 1]]
    rows = [(i, pats[i % 4]) for i in range(40)]
    db = spark.createDataFrame(rows, "vec_id long, bvec array<bigint>")
    qs = db.filter(F.col("vec_id") < 4)
    a = {(r.query_id, r.rank): (r.neighbor_id, r.hamming)
         for r in hamming_topk(db, qs, "bvec", "vec_id", k=7).collect()}
    b = {(r.query_id, r.rank): (r.neighbor_id, r.hamming)
         for r in hamming_topk(db, qs, "bvec", "vec_id", k=7,
                               impl="arrow").collect()}
    assert a == b


def test_hamming_null_codes_excluded(spark):
    """NULL / width-mismatched bvecs yield NULL hamming; ascending sort
    is NULLS FIRST so they'd rank #1 for every query without the explicit
    not-null guard (round-8 advisor)."""
    from pyspark.sql import functions as F

    from feathub_spark.datapipe.similarity import hamming_topk

    rows = [(0, [0, 0]), (1, [1, 0]), (2, [3, 0]), (3, None), (4, [7])]
    db = spark.createDataFrame(rows, "vec_id long, bvec array<bigint>")
    qs = db.filter(F.col("vec_id") == 0)
    for impl in ("sql", "arrow"):  # arrow is the default; pin both
        out = hamming_topk(db, qs, "bvec", "vec_id", k=3, impl=impl).collect()
        got = [(r.rank, r.neighbor_id, r.hamming) for r in out]
        # 3 (NULL) and 4 (width mismatch) excluded, not ranked first
        assert got == [(1, 1, 1), (2, 2, 2)], impl


def test_hamming_arrow_path_matches_sql(spark):
    from pyspark.sql import functions as F

    from feathub_spark.datapipe.similarity import (
        binarize_embeddings,
        hamming_topk,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    db = binarize_embeddings(df, "embedding")
    qs = db.filter(F.col("vec_id") < 10)
    a = {(r.query_id, r.rank): (r.neighbor_id, r.hamming)
         for r in hamming_topk(db, qs, "bvec", "vec_id", k=5).collect()}
    b = {(r.query_id, r.rank): (r.neighbor_id, r.hamming)
         for r in hamming_topk(db, qs, "bvec", "vec_id", k=5,
                               impl="arrow").collect()}
    assert a == b


def test_triangle_counts_golden(spark):
    from feathub_spark.datapipe.graph import triangle_counts

    # K4 (every node in C(3,2)=3 triangles) + a pendant + one separate
    # triangle with a duplicate reversed edge
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5),
             (6, 7), (7, 8), (6, 8), (8, 6)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.n_triangles for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 6: 1, 7: 1, 8: 1}
    # self-loops are dropped, triangle-free graphs return empty
    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 3)], "id_a long, id_b long"
    )
    assert triangle_counts(chain).count() == 0


def test_clustering_coefficients_golden(spark):
    from feathub_spark.datapipe.graph import clustering_coefficients

    # K4 (cc=1 for pure members), node 4 also holds a pendant (d=4, T=3
    # -> 0.5), degree-1 pendant has no neighbor pairs -> NULL
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: (r.degree, r.n_triangles, r.clustering_coeff)
        for r in clustering_coefficients(df).collect()
    }
    assert got[1] == (3, 3, 1.0) and got[2] == (3, 3, 1.0)
    assert got[3] == (3, 3, 1.0)
    assert got[4] == (4, 3, 0.5)
    assert got[5] == (1, 0, None)


def test_gemm_arrow_randomized_vs_numpy_model(spark):
    """Randomized adversarial GEMM conformance: duplicated vectors (dense
    exact ties), query ids inside the corpus (self rows), tiny salt counts
    (maximum self-crowding), and k larger than some salt groups — checked
    against a first-principles numpy model of the documented contract
    (order by score then neighbor id, self excluded, cosine at 6 dp).
    The round-8 advisor found two real bugs in this path; this pins the
    whole contract, not just the two fixtures."""
    import random

    import numpy as np

    from feathub_spark.datapipe.similarity import _gemm_scored_topk

    for seed, n_salts, k in ((11, 1, 4), (12, 3, 6), (13, 32, 3)):
        rnd = random.Random(seed)
        n, d = rnd.randrange(30, 60), 8
        # few distinct patterns -> many exact duplicates and score ties
        pats = [
            [rnd.randrange(-3, 4) for _ in range(d)] for _ in range(5)
        ]
        vecs = [pats[i % len(pats)] for i in range(n)]
        rows = [(i, v) for i, v in enumerate(vecs)]
        df = spark.createDataFrame(rows, "vec_id long, v array<bigint>")
        qids = rnd.sample(range(n), 6)
        qs = df.filter(F.col("vec_id").isin(qids))

        got = {
            (r.query_id, r.rank): (r.neighbor_id, r.cosine)
            for r in _gemm_scored_topk(
                df, qs, "v", "vec_id", k, "vec_id",
                integer=True, n_salts=n_salts,
            ).collect()
        }

        V = np.array(vecs, dtype=np.float64)
        norms = np.sqrt((V ** 2).sum(axis=1))
        want = {}
        for q in qids:
            if norms[q] == 0:
                continue
            scores = []
            for c in range(n):
                if c == q or norms[c] == 0:
                    continue
                cos = round(float(V[q] @ V[c] / (norms[q] * norms[c])), 6)
                scores.append((-cos, c))
            scores.sort()
            for rank, (negcos, c) in enumerate(scores[:k], start=1):
                want[(q, rank)] = (c, -negcos)
        assert got == want, f"seed={seed} n_salts={n_salts} k={k}"


def test_shingles_arrow_twin(spark):
    """The pandas shingle twin must be byte-identical to the Catalyst
    fold — ASCII-only \\s splitting (\\xa0 is NOT a separator), trim of
    0x20 only, unicode lowercase incl. final-sigma / dotted-I expansion,
    first-occurrence distinct order, NULL -> [None], short/empty
    collapse."""
    import random

    from feathub_spark.datapipe.dedup import _shingles_col, _shingles_sql

    rnd = random.Random(77)
    alphabet = list("abc XYZ \t\n\x0b\f\r") + [
        "\xa0", " ", "İ", "ß", "ẞ", "Σ", "ΟΣ", "é", "漢", "🙂", "'",
        '"', "\\", "`", "0", ".",
    ]
    texts = [None, "", " ", "   ", "a", "a b", "\t\n", "\xa0", "ΣΑΣ ΟΣ Σ"]
    texts += [
        "".join(rnd.choice(alphabet) for _ in range(rnd.randrange(0, 60)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    for k in (1, 2, 3, 5):
        got = {
            r.i: r.g
            for r in df.select(
                "i", _shingles_col("t", k).alias("g")
            ).collect()
        }
        want = {
            r.i: r.g
            for r in df.select(
                "i", F.expr(_shingles_sql("t", k)).alias("g")
            ).collect()
        }
        assert got == want, (
            k,
            [(i, texts[i], got[i], want[i]) for i in got if got[i] != want[i]][:3],
        )


def test_ivf_assignment_arrow_matches_sql(spark):
    """The arrow centroid-assignment twin must make IDENTICAL ordering
    decisions to the crossJoin+round+window SQL form — including zero
    vectors (NaN cosine ranks FIRST in Spark's DESC), NULL / width-
    mismatched vectors (all-NULL cosines -> smallest cids), duplicated
    vectors (rounded-cosine ties -> cid asc), and top_n probing."""
    import random

    from feathub_spark.datapipe.similarity import (
        cluster_balanced_sample,
        ivf_topk,
        train_ivf_codebook,
    )

    rnd = random.Random(31)
    rows = []
    for i in range(300):
        if i % 37 == 0:
            rows.append((i, [0.0] * 8))                  # zero vector: NaN
        elif i % 41 == 0:
            rows.append((i, None))                       # NULL vector
        elif i % 43 == 0:
            rows.append((i, [1.0] * 5))                  # width mismatch
        else:
            base = [rnd.uniform(-1, 1) for _ in range(8)]
            rows.append((i, base))
            if i % 7 == 0:
                rows.append((1000 + i, list(base)))      # exact duplicate
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = df.filter(F.col("vec_id") < 25)

    kw = dict(k=5, n_centroids=16, nprobe=3, seed=3)
    a = {(r.query_id, r.rank): (r.neighbor_id, r.cosine)
         for r in ivf_topk(df, qs, "embedding", "vec_id",
                           impl="arrow", **kw).collect()}
    b = {(r.query_id, r.rank): (r.neighbor_id, r.cosine)
         for r in ivf_topk(df, qs, "embedding", "vec_id",
                           impl="sql", **kw).collect()}
    assert a == b

    ca = {tuple(r) for r in cluster_balanced_sample(
        df, "embedding", "vec_id", per_cell=3, n_centroids=16, seed=3,
        impl="arrow").collect()}
    cb = {tuple(r) for r in cluster_balanced_sample(
        df, "embedding", "vec_id", per_cell=3, n_centroids=16, seed=3,
        impl="sql").collect()}
    assert ca == cb

    ta = {(r["__cid__"], tuple(r["__cvec__"]))
          for r in train_ivf_codebook(df, "embedding", "vec_id",
                                      n_centroids=8, iterations=2, seed=3,
                                      impl="arrow").collect()}
    tb = {(r["__cid__"], tuple(r["__cvec__"]))
          for r in train_ivf_codebook(df, "embedding", "vec_id",
                                      n_centroids=8, iterations=2, seed=3,
                                      impl="sql").collect()}
    assert ta == tb


def test_shingle_rows_arrow_matches_sql_explode(spark):
    """The flat (id, n, gram) mapInArrow shingle emit must equal the SQL
    fold's size+explode rows as a SET on the full fuzz alphabet — incl.
    final-sigma/dotted-I lowering, NULL text -> one NULL gram (n=1),
    short/empty collapse, and within-doc gram dedup."""
    import random

    from feathub_spark.datapipe.dedup import _shingle_rows_arrow, _shingles_sql

    rnd = random.Random(78)
    alphabet = list("abc XYZ \t\n\x0b\f\r") + [
        "\xa0", " ", "İ", "ß", "ẞ", "Σ", "ΟΣ", "é", "漢", "🙂", "'",
        '"', "\\", "`", "0", ".",
    ]
    texts = [None, "", " ", "   ", "a", "a b", "\t\n", "\xa0", "ΣΑΣ ΟΣ Σ",
             "a b a b a b"]
    texts += [
        "".join(rnd.choice(alphabet) for _ in range(rnd.randrange(0, 60)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    for k in (1, 3):
        got = sorted(
            map(tuple, _shingle_rows_arrow(df, "t", "i", k).collect()),
            key=repr,
        )
        want = sorted(
            map(
                tuple,
                df.select(
                    F.col("i").alias("__id__"),
                    F.expr(_shingles_sql("t", k)).alias("__g__"),
                )
                .select(
                    "__id__",
                    F.size("__g__").cast("long").alias("__n__"),
                    F.explode("__g__").alias("__gram__"),
                )
                .collect(),
            ),
            key=repr,
        )
        assert got == want, (k, got[:3], want[:3], len(got), len(want))


def test_shingle_rows_arrow_sliced_emit_matches_unsliced(spark):
    """The per-slice byte bound (memory guard for huge-document batches)
    must be semantics-free: with the bound shrunk so every Arrow batch is
    force-split into many row slices — including single-row slices larger
    than the bound — the emitted row set is identical."""
    import feathub_spark.datapipe.dedup as dedup_mod
    from feathub_spark.datapipe.dedup import _shingle_rows_arrow

    texts = [
        (0, None), (1, ""), (2, "a b c d e f g"),
        (3, " ".join(f"w{i}" for i in range(400))),  # one huge doc >> bound
        (4, "lone"), (5, "Σ ΟΣ ΣΑΣ İ ß"), (6, "a b c " * 50),
    ]
    df = spark.createDataFrame(texts, "i long, t string")
    baseline = sorted(
        map(tuple, _shingle_rows_arrow(df, "t", "i", 3).collect()), key=repr
    )
    old = dedup_mod._SHINGLE_SLICE_BYTES
    dedup_mod._SHINGLE_SLICE_BYTES = 16  # smaller than most single rows
    try:
        sliced = sorted(
            map(tuple, _shingle_rows_arrow(df, "t", "i", 3).collect()),
            key=repr,
        )
    finally:
        dedup_mod._SHINGLE_SLICE_BYTES = old
    assert sliced == baseline and len(baseline) > 100


def test_expand_sized_pairs_arrow_matches_sql(spark):
    """The numpy triangular-expansion twin must emit exactly the rows of
    the Catalyst transform/slice form — ragged lists, singletons (dropped),
    empty lists, duplicate sizes, long-id and string-id members."""
    import random

    from feathub_spark.datapipe.dedup import _expand_sized_pairs

    rnd = random.Random(7)
    rows = [([],)]
    for _ in range(400):
        m = rnd.choice([1, 2, 2, 3, 5, 8, 25])
        mem = sorted({rnd.randrange(1000) for _ in range(m)})
        rows.append(([{"i": i, "n": i % 17 + 1} for i in mem],))
    pdf = spark.createDataFrame(
        rows, "mem array<struct<i:bigint,n:bigint>>"
    ).withColumnRenamed("mem", "__mem__")
    got = sorted(map(tuple, _expand_sized_pairs(pdf, impl="auto").collect()))
    want = sorted(map(tuple, _expand_sized_pairs(pdf, impl="sql").collect()))
    assert got == want and len(got) > 1000

    srows = [
        ([{"i": f"d{i:03d}", "n": i % 5 + 1}
          for i in sorted({rnd.randrange(100) for _ in range(4)})],)
        for _ in range(60)
    ]
    sdf = spark.createDataFrame(
        srows, "mem array<struct<i:string,n:bigint>>"
    ).withColumnRenamed("mem", "__mem__")
    got = sorted(map(tuple, _expand_sized_pairs(sdf, impl="auto").collect()))
    want = sorted(map(tuple, _expand_sized_pairs(sdf, impl="sql").collect()))
    assert got == want and got


def test_expand_id_pairs_arrow_matches_sql(spark):
    """Payload-free sibling: numpy expansion == Catalyst expansion over
    ragged sorted-id posting arrays (bigint and string ids)."""
    import random

    from feathub_spark.datapipe.dedup import _expand_id_pairs

    rnd = random.Random(11)
    rows = [([],)] + [
        (sorted({rnd.randrange(2000) for _ in range(rnd.choice([1, 2, 3, 7, 40]))}),)
        for _ in range(500)
    ]
    pdf = spark.createDataFrame(rows, "ids array<bigint>").withColumnRenamed(
        "ids", "__ids__"
    )
    got = sorted(map(tuple, _expand_id_pairs(pdf, impl="auto").collect()))
    want = sorted(map(tuple, _expand_id_pairs(pdf, impl="sql").collect()))
    assert got == want and len(got) > 2000

    srows = [
        (sorted({f"d{rnd.randrange(300):03d}" for _ in range(3)}),)
        for _ in range(80)
    ]
    sdf = spark.createDataFrame(srows, "ids array<string>").withColumnRenamed(
        "ids", "__ids__"
    )
    got = sorted(map(tuple, _expand_id_pairs(sdf, impl="auto").collect()))
    want = sorted(map(tuple, _expand_id_pairs(sdf, impl="sql").collect()))
    assert got == want and got


def test_triu_expand_flush_bounded_buffers(spark):
    """The Arrow expansion must emit identical rows when its flush
    threshold forces many small yields per batch (the memory-bounding
    path a 1024-member posting exercises at scale)."""
    import random

    from pyspark.sql import types as T

    from feathub_spark.datapipe.dedup import _triu_expand_generator

    rnd = random.Random(3)
    rows = [
        (sorted({rnd.randrange(5000) for _ in range(rnd.choice([2, 30, 90]))}),)
        for _ in range(200)
    ]
    pdf = spark.createDataFrame(rows, "ids array<bigint>").withColumnRenamed(
        "ids", "__ids__"
    )
    schema = T.StructType([
        T.StructField("id_a", T.LongType()),
        T.StructField("id_b", T.LongType()),
    ])
    big = sorted(map(tuple, pdf.mapInArrow(
        _triu_expand_generator(["__ids__"], ["id_a", "id_b"]), schema
    ).collect()))
    tiny = sorted(map(tuple, pdf.mapInArrow(
        _triu_expand_generator(["__ids__"], ["id_a", "id_b"], flush_pairs=7),
        schema,
    ).collect()))
    assert big == tiny and len(big) > 10_000


def test_ngram_jaccard_cut_path_matches_exact_incl_null_text(spark):
    """The flat-emit cut path must reproduce the exact (None) path
    whenever the cut is a no-op — including the degenerate corners the
    survivor-verify recount has to get right: NULL-text docs (one NULL
    gram each; null-safe intersection pairs them at jaccard 1.0),
    empty/short docs (join-all gram), and ordinary near-dups."""
    import random

    from feathub_spark.datapipe.dedup import ngram_jaccard_pairs

    rnd = random.Random(41)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    rows = [(1, None), (2, None), (3, ""), (4, "  "), (5, "alpha")]
    rows += [
        (10 + i, " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(0, 12))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for thr in (0.2, 0.5):
        exact = sorted(
            map(tuple, ngram_jaccard_pairs(
                df, "text", "doc_id", n=2, threshold=thr, max_doc_freq=None
            ).collect())
        )
        cut = sorted(
            map(tuple, ngram_jaccard_pairs(
                df, "text", "doc_id", n=2, threshold=thr, max_doc_freq=10_000
            ).collect())
        )
        assert cut == exact and ((1, 2, 1.0) in cut)


def test_ngram_jaccard_none_path_drops_null_ids(spark):
    """max_doc_freq=None must exclude NULL-id documents exactly like the
    cut path (whose bare collect_list skips them)."""
    from feathub_spark.datapipe.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (None, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    exact = sorted(
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", n=2, threshold=0.5, max_doc_freq=None
        ).collect()
    )
    cut = sorted(
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", n=2, threshold=0.5, max_doc_freq=16
        ).collect()
    )
    assert exact == cut == [(1, 2)]


def test_phrase_search_backslash_terms(spark):
    """Review finding: phrase-term literals were quote-doubled but not
    backslash-escaped, so a term like 'a\\b' never matched."""
    from feathub_spark.datapipe.retrieval import phrase_search

    df = spark.createDataFrame(
        [(1, "x a\\b y"), (2, "a\\b y z"), (3, "nothing here")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, "text", "doc_id", "a\\b y").collect()
    }
    assert got == {1: (1, 1), 2: (1, 0)}


def test_rrf_fuse_empty_rankings_raises(spark):
    from feathub_spark.datapipe.retrieval import rrf_fuse

    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one ranking"):
        rrf_fuse([])


def test_parse_video_header_faststart_prefix_tolerated():
    """Review finding: a header-prefix payload of a faststart MP4 (ftyp +
    complete moov + cut-off mdat — the natural thing to store for
    header-only metadata) must parse; a truncated STRUCTURAL box still
    raises."""
    import pytest as _pytest

    from feathub_spark.datapipe.multimodal import parse_video_header

    def be(v, n):
        return int(v).to_bytes(n, "big")

    mvhd = be(108, 4) + b"mvhd" + bytes([0, 0, 0, 0]) + bytes(8) \
        + be(1000, 4) + be(43210, 4) + bytes(80)
    tkhd = be(92, 4) + b"tkhd" + bytes([0, 0, 0, 0]) + bytes(72) \
        + be(320 << 16, 4) + be(240 << 16, 4)
    trak = be(100, 4) + b"trak" + tkhd
    moov = be(8 + len(mvhd) + len(trak), 4) + b"moov" + mvhd + trak
    ftyp = be(20, 4) + b"ftyp" + b"isom" + bytes(4) + b"isom"
    # mdat claims 1 MiB but only 16 bytes of it are in the payload
    mdat_prefix = be(1 << 20, 4) + b"mdat" + bytes(16)
    got = parse_video_header(ftyp + moov + mdat_prefix)
    assert got == (320, 240, 43210, 1000, 1, "mp4")
    # a truncated moov (structural) still raises
    bad_moov = be(1 << 20, 4) + b"moov" + bytes(16)
    with _pytest.raises(ValueError):
        parse_video_header(ftyp + bad_moov)
