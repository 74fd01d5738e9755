"""Round-2 curation/sampling/similarity additions: bigram LM quality, URL
blocklist filtering, Matryoshka truncation, temperature mixture, JSONL
source."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from engine.extended.curation import (
    bigram_lm_scores,
    domain_blocklist_filter,
    extract_urls,
    url_domain,
)
from engine.extended.sampling import temperature_mixture
from engine.extended.similarity import matryoshka_truncate


def test_bigram_lm_scores_hand_computed(spark):
    # corpus: d1 "x y x y", d2 "x z"
    # bigram counts: xy=2, yx=1, xz=1; history counts: x.=3, y.=1
    # d1 logps: log2(2/3), log2(1/1), log2(2/3); d2: log2(1/3)
    df = spark.createDataFrame(
        [(1, "x y x y"), (2, "x z"), (3, "solo")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert set(out) == {1, 2}  # <2 tokens -> no score (doc 3 absent)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logp"] == round(2 * math.log2(2 / 3) / 3, 4)
    assert out[2]["avg_logp"] == round(math.log2(1 / 3), 4)


def test_url_extract_and_domain(spark):
    df = spark.createDataFrame(
        [(1, "go to https://a.example.org/x/y and http://b.net now"), (2, "no links")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["urls"]
        for r in df.select("doc_id", extract_urls("text").alias("urls")).collect()
    }
    assert rows[1] == ["https://a.example.org/x/y", "http://b.net"]
    assert rows[2] == []
    dom = df.select(url_domain(F.lit("https://a.example.org/x")).alias("d")).first()["d"]
    assert dom == "a.example.org"


def test_domain_blocklist_filter_drops_flagged_docs(spark):
    df = spark.createDataFrame(
        [
            (1, "see https://good.org/a"),
            (2, "see https://evil.example.net/b ok"),
            (3, "plain text"),
            (4, "both https://good.org/c http://evil.example.net/d"),
        ],
        "doc_id long, text string",
    )
    blocked = spark.createDataFrame([("evil.example.net",)], "domain string")
    kept = {r["doc_id"] for r in domain_blocklist_filter(df, blocked).collect()}
    assert kept == {1, 3}


def test_matryoshka_truncate_renormalizes_prefix(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0, 100.0]), (2, [0.0, 0.0, 5.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["vec_id"]: r["mrl_vec"]
        for r in matryoshka_truncate(df, 2, round_to=4).select("vec_id", "mrl_vec").collect()
    }
    assert out[1] == [0.6, 0.8]       # 3-4-5 triangle, unit-normalized
    assert out[2] == [0.0, 0.0]       # zero prefix stays zero (no div-by-0)


def test_matryoshka_truncate_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<float>")
    plan = (
        matryoshka_truncate(df, 2)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_temperature_mixture_quota_rule(spark):
    # 90 'web' + 10 'book', alpha=0.5, total=41:
    # w = (sqrt(90), sqrt(10)), shares = .75/.25 -> quotas floor(30.75)=30, floor(10.25)=10
    rows = [(i, "web") for i in range(90)] + [(100 + i, "book") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture(df, alpha=0.5, total=41, group_col="source")
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"web": 30, "book": 10}
    # determinism under repartition
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mixture(
            df.repartition(7), alpha=0.5, total=41, group_col="source"
        ).collect()
    )
    assert a == b


def test_temperature_mixture_saturates_small_groups(spark):
    # alpha=0 -> uniform-by-group quotas; a tiny group saturates at n_g
    rows = [(i, "big") for i in range(100)] + [(200, "tiny")]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    counts = {
        r["source"]: r["n"]
        for r in temperature_mixture(df, alpha=0.0, total=50, group_col="source")
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {"big": 25, "tiny": 1}  # floor(50*.5)=25; tiny capped at 1


def test_jsonl_roundtrip_and_quarantine(spark, tmp_path):
    from engine.sources.jsonl import DOCUMENTS_SCHEMA, read_jsonl, write_jsonl

    df = spark.createDataFrame(
        [(1, "hello", "en", "web"), (2, "welt", "de", "book")],
        "doc_id long, text string, lang string, source string",
    )
    p = str(tmp_path / "docs_jsonl")
    write_jsonl(df, p)
    # plant a corrupt shard line
    with open(f"{p}/zz_corrupt.json", "w") as f:
        f.write('{"doc_id": 3, "text": "ok", "lang": "en", "source": "web"}\n')
        f.write("{this is not json\n")
    result = read_jsonl(spark, p, DOCUMENTS_SCHEMA)
    good, quarantine = result.good, result.quarantine
    assert {r["doc_id"] for r in good.collect()} == {1, 2, 3}
    assert good.columns == ["doc_id", "text", "lang", "source"]
    bad = quarantine.collect()
    assert len(bad) == 1 and bad[0]["raw_line"].startswith("{this")
    assert result.parsed.is_cached
    result.unpersist(blocking=True)
    assert not result.parsed.is_cached


def test_tar_shard_source_roundtrip_and_png_decode(spark, tmp_path):
    """WebDataset-style tar shards: write 2 shards of (png, txt) samples,
    read members in parallel, group into sample dicts, and REALLY decode the
    PNG payloads with the stdlib codec."""
    from engine.extended.imagecodec import png_decode, png_encode
    from engine.sources.tarshard import group_samples, read_tar_shards, write_tar_shard

    def sample(i):
        pixels = bytes((i * 37 + j) % 251 for j in range(6 * 4 * 3))
        return png_encode(pixels, 6, 4, 3), f"caption number {i}".encode()

    for shard in range(2):
        rows = []
        for i in range(shard * 3, shard * 3 + 3):
            png, txt = sample(i)
            rows.append((f"{i:06d}.png", png))
            rows.append((f"{i:06d}.txt", txt))
        write_tar_shard(rows, str(tmp_path / f"shard{shard}.tar"))

    members = read_tar_shards(spark, str(tmp_path / "*.tar"))
    assert members.count() == 12
    assert set(members.select("ext").distinct().toPandas()["ext"]) == {"png", "txt"}

    grouped = group_samples(members).collect()
    assert len(grouped) == 6
    for r in grouped:
        parts = r["parts"]
        assert set(parts) == {"png", "txt"}
        w, h, ch, pixels = png_decode(bytes(parts["png"]))
        assert (w, h, ch) == (6, 4, 3)
        i = int(r["key"])
        assert pixels == bytes((i * 37 + j) % 251 for j in range(6 * 4 * 3))
        assert bytes(parts["txt"]) == f"caption number {i}".encode()


def test_centroid_negative_zero_normalized(spark):
    # ROUND(avg(-0.00004), 4) is IEEE -0.0; repr divergence ('-0.0' vs '0.0')
    # breaks cross-engine value hashes -> the operator must emit +0.0
    import math

    from engine.extended.semdedup import centroids_by

    df = spark.createDataFrame(
        [(0, [-0.00004, 0.5])], "label int, embedding array<float>"
    )
    rows = {r["pos"]: r["centroid"] for r in centroids_by(df).collect()}
    assert rows[1] == 0.0 and math.copysign(1, rows[1]) > 0
    m = matryoshka_truncate(
        spark.createDataFrame([(1, [-0.00001, 1.0])], "vec_id long, embedding array<float>"),
        2, round_to=4,
    ).select("mrl_vec").first()["mrl_vec"]
    assert m[0] == 0.0 and math.copysign(1, m[0]) > 0


def test_temperature_mixture_integral_share_boundary(spark):
    # 4 equal groups, total 80 -> every share is EXACTLY 20.0; the floor
    # epsilon must resolve the boundary upward (20 rows each, never 19)
    rows = [(g * 100 + i, f"g{g}") for g in range(4) for i in range(25)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    counts = {
        r["source"]: r["n"]
        for r in temperature_mixture(df, alpha=0.5, total=80, group_col="source")
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts == {f"g{g}": 20 for g in range(4)}


def test_read_tar_samples_zero_exchange_matches_grouped(spark, tmp_path):
    from engine.extended.imagecodec import png_encode
    from engine.sources.tarshard import group_samples, read_tar_samples, read_tar_shards, write_tar_shard

    rows = []
    for i in range(3):
        rows.append((f"{i}.png", png_encode(bytes(range(12)), 2, 2, 3)))
        rows.append((f"{i}.txt", f"t{i}".encode()))
    write_tar_shard(rows, str(tmp_path / "s.tar"))

    direct = read_tar_samples(spark, str(tmp_path / "*.tar"))
    assert "Exchange" not in direct._jdf.queryExecution().executedPlan().toString()
    d = {r["key"]: dict(r["parts"]) for r in direct.collect()}
    g = {
        r["key"]: dict(r["parts"])
        for r in group_samples(read_tar_shards(spark, str(tmp_path / "*.tar"))).collect()
    }
    assert {k: {e: bytes(v) for e, v in p.items()} for k, p in d.items()} == {
        k: {e: bytes(v) for e, v in p.items()} for k, p in g.items()
    }


def test_canonical_url_chain(spark):
    """Scheme/host lowering, www + default-port drop, tracking-param strip
    with separator repair, fragment drop, trailing-slash trim; non-URLs and
    NULLs yield NULL."""
    from engine.extended.curation import canonical_url

    cases = [
        # r9: the trailing-PATH-slash trim now applies before '?' too
        # (consistent with the no-query case below), while QUERY VALUES
        # keep their slashes — the old whole-rest trim collapsed
        # '?next=/' and '?next=' into one key (review catch)
        ("HTTP://WWW.Site.com:80/a/?utm_source=x&q=1#top", "http://site.com/a?q=1"),
        ("http://site.com/login?next=/", "http://site.com/login?next=/"),
        ("https://site.com:443/a?utm_campaign=z", "https://site.com/a"),
        ("http://site.com/a/", "http://site.com/a"),
        ("https://Other.org/Path/To?b=2&utm_medium=m&c=3",
         "https://other.org/Path/To?b=2&c=3"),
        ("http://site.com:8080/x", "http://site.com:8080/x"),  # non-default port kept
        ("https://site.com/?fbclid=abc", "https://site.com"),
        # literal &utm_ in the PATH is RFC-legal and must survive
        ("http://site.com/a&utm_source=x/b", "http://site.com/a&utm_source=x/b"),
        # trailing newline: \z anchors must NOT strip before it (RE2 parity)
        ("http://site.com/a/\n", "http://site.com/a/\n"),
        ("not a url", None),
        (None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r["c"] for r in df.select(canonical_url("u").alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_fix_mojibake_repairs_and_is_idempotent(spark):
    from engine.extended.curation import fix_mojibake

    bad = "cafÃ© â€œquotedâ€™ â€“ dash"
    want = "café “quoted’ – dash"
    df = spark.createDataFrame([(bad,), (want,), (None,)], "t string")
    got = [r["f"] for r in df.select(fix_mojibake("t").alias("f")).collect()]
    assert got[0] == want
    assert got[1] == want  # idempotent on clean text
    assert got[2] is None


# ---------------------------------------------------------------------------
# Image perceptual hashing (aHash) + hamming near-dup pairs
# ---------------------------------------------------------------------------


def _gradient_png(w=16, h=16, flip=False, tweak_px=None):
    from engine.extended.imagecodec import png_encode

    px = bytearray()
    for y in range(h):
        for x in range(w):
            v = (x * 255) // (w - 1)
            if flip:
                v = 255 - v
            px.append(v)
    if tweak_px is not None:
        px[tweak_px] = 255 - px[tweak_px]
    return png_encode(bytes(px), w, h, 1)


def test_image_ahash_identical_and_near_images(spark):
    from engine.extended.multimodal import image_ahash

    rows = [
        (1, _gradient_png(), "image/png"),
        (2, _gradient_png(tweak_px=5), "image/png"),   # one pixel flipped
        (3, _gradient_png(flip=True), "image/png"),    # inverse gradient
        (4, None, "image/png"),                        # missing payload
        (5, b"\x00\x01not-an-image", "application/octet-stream"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    got = {r["media_id"]: r for r in image_ahash(df).collect()}
    assert got[1]["ahash"] is not None

    def hd(a, b):  # hashes are SIGNED longs: mask before counting
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    # a single flipped pixel moves at most one grid cell: hamming <= 1
    assert hd(got[1]["ahash"], got[2]["ahash"]) <= 1
    # the inverse gradient flips every thresholded cell: far away
    assert hd(got[1]["ahash"], got[3]["ahash"]) > 20
    assert got[4]["ahash"] is None  # missing payload survives with null
    assert got[5]["ahash"] is None  # undecodable bytes survive with null


def test_image_near_dup_pairs_finds_only_the_near_pair(spark):
    from engine.extended.multimodal import image_ahash, image_near_dup_pairs

    rows = [
        (1, _gradient_png(), "image/png"),
        (2, _gradient_png(tweak_px=5), "image/png"),
        (3, _gradient_png(flip=True), "image/png"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary, mime string")
    pairs = image_near_dup_pairs(image_ahash(df), max_hamming=3).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["hamming"] <= 1


def test_image_ahash_validation(spark):
    import pytest

    from engine.extended.multimodal import image_ahash, image_near_dup_pairs

    df = spark.createDataFrame([(1, b"", "x")], "media_id long, payload binary, mime string")
    with pytest.raises(ValueError, match="grid"):
        image_ahash(df, grid=9)
    with pytest.raises(ValueError, match="max_hamming"):
        image_near_dup_pairs(df.withColumnRenamed("payload", "ahash"), max_hamming=65)


# ---------------------------------------------------------------------------
# Audio: WAV codec round-trip, PCM features, energy fingerprint
# ---------------------------------------------------------------------------


def test_wav_codec_roundtrip_and_header():
    from engine.extended.audiocodec import parse_wav_header, wav_decode, wav_encode

    samples = [0, 100, -100, 32767, -32768, 7, -7, 0]
    data = wav_encode(samples, 16000, 2)
    hdr = parse_wav_header(data)
    assert hdr == {
        "sample_rate": 16000, "channels": 2, "bits": 16,
        "n_frames": 4, "duration_ms": 0,
    }
    assert wav_decode(data) == samples
    assert parse_wav_header(b"not a wav") is None
    assert wav_decode(b"RIFF\x00\x00\x00\x00WAVEjunk") is None


def test_audio_features_constant_signal(spark):
    """A constant-amplitude clip: peak == |v|, rms == |v|, zero crossings 0."""
    from engine.extended.audiocodec import wav_encode
    from engine.extended.multimodal import audio_features

    clip = wav_encode([1000] * 400, 8000, 1)
    bad = b"\x00\x01\x02"
    df = spark.createDataFrame(
        [(1, clip), (2, None), (3, bad)], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in audio_features(df).collect()}
    assert got[1]["peak"] == 1000
    assert got[1]["rms"] == 1000.0
    assert got[1]["zero_crossings"] == 0
    assert got[1]["n_frames"] == 400
    assert got[1]["duration_ms"] == 50
    assert got[2]["rms"] is None and got[3]["rms"] is None  # null-survival


def test_audio_fingerprint_volume_invariant_and_discriminative(spark):
    """Same clip at double volume keeps the exact fingerprint (energy
    DELTAS scale together); a different random clip lands far away."""
    import hashlib
    import struct as st

    from engine.extended.audiocodec import wav_encode
    from engine.extended.multimodal import audio_fingerprint, image_near_dup_pairs

    def noise(seed, n=1024, scale=1):
        stream = bytearray()
        c = 0
        while len(stream) < n * 2:
            stream += hashlib.sha256(seed + st.pack("<I", c)).digest()
            c += 1
        vals = st.unpack(f"<{n}h", bytes(stream[: n * 2]))
        return [max(-32768, min(32767, v * scale // 2)) for v in vals]

    a = wav_encode(noise(b"a"), 8000, 1)
    a_loud = wav_encode([v * 2 for v in noise(b"a")], 8000, 1)
    c = wav_encode(noise(b"c"), 8000, 1)
    df = spark.createDataFrame(
        [(1, a), (2, a_loud), (3, c)], "media_id long, payload binary"
    )
    got = {r["media_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert got[1] == got[2]  # volume-invariant
    far = bin((got[1] ^ got[3]) & ((1 << 64) - 1)).count("1")
    assert far > 10
    pairs = image_near_dup_pairs(
        audio_fingerprint(df), max_hamming=3, hash_col="afp"
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]


def test_audio_fingerprint_short_clip_nulls(spark):
    from engine.extended.audiocodec import wav_encode
    from engine.extended.multimodal import audio_fingerprint

    short = wav_encode([5] * 10, 8000, 1)  # fewer frames than windows
    df = spark.createDataFrame([(1, short)], "media_id long, payload binary")
    assert audio_fingerprint(df).collect()[0]["afp"] is None


def test_wav_header_uses_first_data_chunk():
    """Review finding: a WAV with two data chunks must report n_frames for
    the SAME chunk wav_decode returns (the first)."""
    import struct as st

    from engine.extended.audiocodec import parse_wav_header, wav_decode, wav_encode

    base = wav_encode([1, 2, 3, 4], 8000, 1)
    extra = b"data" + st.pack("<I", 4) + st.pack("<2h", 9, 9)
    two = base + extra  # second data chunk appended inside the RIFF body
    hdr = parse_wav_header(two)
    samples = wav_decode(two)
    assert samples == [1, 2, 3, 4]
    assert hdr["n_frames"] == len(samples)


def test_fake_wav_corpus_validates_max_frames(spark):
    import pytest

    from engine.extended.multimodal import fake_wav_corpus

    d = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="max_frames"):
        fake_wav_corpus(d, max_frames=255)
