"""Pure-kernel parity tests (no Spark) — SURVEY.md §5.1.

The first two tests are the reference's only unit tests, ported verbatim
(/root/reference/src/utils/keyword_utils.rs:20-33).
"""

import numpy as np
import pandas as pd
import pytest

from crawler_spark import kernels as K


# --- reference tests, verbatim (keyword_utils.rs:22-27, :29-33) ----------

def test_parse_whitespace_separated_keywords():
    assert len(K.tokenize_keywords("keyword1 keyword2 keyword3")) == 3


def test_parse_consider_quote_signed_keywords():
    assert len(K.tokenize_keywords('keyword "keyword keyword1" keyword2')) == 3


def test_tokenize_strips_quotes_and_backslashes():
    assert K.tokenize_keywords('"a b" c\\d') == ["a b", "cd"]
    assert K.tokenize_keywords(None) == []


# --- URL canonicalization -------------------------------------------------

@pytest.mark.parametrize(
    "raw,canon",
    [
        ("HTTP://Example.COM:80/a//b?z=1&a=2#frag", "http://example.com/a/b?a=2&z=1"),
        ("https://example.com:443", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com/path?", "http://example.com/path"),
        ("http://example.com/path?b=&a=1", "http://example.com/path?a=1&b="),
    ],
)
def test_canonicalize_url(raw, canon):
    assert K.canonicalize_url(raw) == canon


def test_canonicalize_idempotent():
    urls = ["http://A.com/x?b=2&a=1", "https://b.org:443//y/"]
    once = [K.canonicalize_url(u) for u in urls]
    assert [K.canonicalize_url(u) for u in once] == once


def test_url_hash64_matches_md5_prefix():
    # the exact portability contract used by Spark conv() and DuckDB ::BIGINT
    import hashlib
    u = "http://example.com/"
    assert K.url_hash64(u) == int(hashlib.md5(u.encode()).hexdigest()[:15], 16)
    assert 0 <= K.url_hash64(u) < (1 << 60)


# --- staleness policy truth table (video_scraper.rs:99-130) ---------------

HOUR, DAY, WEEK = 3600, 86400, 7 * 86400


@pytest.mark.parametrize(
    "age,expected",
    [
        (0, 3 * HOUR),
        (WEEK - 1, 3 * HOUR),
        (WEEK, DAY),
        (4 * WEEK - 1, DAY),
        (4 * WEEK, WEEK),
        (24 * WEEK - 1, WEEK),
        (24 * WEEK, 4 * WEEK),  # reference: 6 * 4 * ONE_WEEK
        (100 * WEEK, 4 * WEEK),
    ],
)
def test_staleness_thresholds(age, expected):
    assert K.staleness_threshold_secs([age])[0] == expected


def test_should_refresh_new_always():
    assert K.should_refresh([0], [0], [True])[0]
    assert not K.should_refresh([0], [3 * HOUR - 1], [False])[0]
    assert K.should_refresh([0], [3 * HOUR], [False])[0]


# --- quota day roll (apikeys_repo.rs:39-67) -------------------------------

def test_quota_roll_same_day_increments():
    used, day = K.quota_roll([5], [20240101], [20240101])
    assert (used[0], day[0]) == (6, 20240101)


def test_quota_roll_new_day_resets():
    used, day = K.quota_roll([5], [20240101], [20240102])
    assert (used[0], day[0]) == (1, 20240102)


def test_quota_roll_vectorized_mixed():
    used, day = K.quota_roll([5, 7], [20240101, 20240102], [20240102, 20240102], inc=2)
    assert list(used) == [2, 9]
    assert list(day) == [20240102, 20240102]


# --- term classifier precedence (sailing_terms_service.rs:37-77) ----------

def test_classify_terms_precedence():
    titles = pd.Series(["Sailing the seas", "cooking show", "Ocean vlog", "SAILBOAT life"])
    descs = pd.Series(["", "", "about sailing", ""])
    terms = ["sailing", "sailboat"]
    out = K.classify_terms(titles, descs, terms)
    assert list(out) == [True, False, True, True]
    # ignore_terms admits everything not blacklisted
    out = K.classify_terms(titles, descs, terms, ignore_terms=True)
    assert list(out) == [True, True, True, True]
    # blacklist wins over everything
    bl = pd.Series([True, False, True, False])
    out = K.classify_terms(titles, descs, terms, ignore_terms=True, blacklisted=bl)
    assert list(out) == [False, True, False, True]


# --- language ID ----------------------------------------------------------

def test_detect_language():
    texts = pd.Series(
        [
            "the wind and the waves are strong in the morning",
            "der Wind und die Wellen, das ist nicht schlecht",
            "xqz",  # unreliable -> None
        ]
    )
    out = K.detect_language(texts)
    assert list(out) == ["en", "de", None]


# --- text quality / tokens / fingerprints ----------------------------------

def test_token_count_and_quality():
    texts = pd.Series(["Hello, world! This is a test.", ""])
    assert list(K.token_count(texts)) == [9, 0]
    q = K.quality_score(texts)
    assert q.loc[0, "n_tokens"] == 9
    assert 0.0 <= q.loc[0, "quality"] <= 1.0
    assert q.loc[1, "n_chars"] == 0


def test_word_shingles():
    assert K.word_shingles("a b c d", k=3) == ["a b c", "b c d"]
    assert K.word_shingles("a b", k=3) == ["a b"]
    assert K.word_shingles("", k=3) == []


def test_fingerprint_winnow_deterministic_and_shared():
    a = K.fingerprint_winnow("the quick brown fox jumps over the lazy dog " * 3)
    b = K.fingerprint_winnow("the quick brown fox jumps over the lazy dog " * 3)
    assert a == b and len(a) > 0
    # a doc sharing a long run shares fingerprints
    c = K.fingerprint_winnow(
        "completely different preamble here " + "the quick brown fox jumps over the lazy dog " * 3
    )
    assert set(a) & set(c)


# --- minhash / simhash ------------------------------------------------------

def test_minhash_jaccard_estimate():
    s1 = K.word_shingles("a b c d e f g h i j k l", k=2)
    sig1 = K.minhash_signature(s1, 64)
    sig2 = K.minhash_signature(s1, 64)
    assert sig1 == sig2
    s3 = K.word_shingles("a b c d e f g h i j x y", k=2)
    sig3 = K.minhash_signature(s3, 64)
    est = sum(1 for x, y in zip(sig1, sig3) if x == y) / 64
    toks1, toks3 = set(s1), set(s3)
    true_j = len(toks1 & toks3) / len(toks1 | toks3)
    assert abs(est - true_j) < 0.25


def test_simhash_near_duplicates_close():
    t1 = "the quick brown fox jumps over the lazy dog and runs away fast".split()
    t2 = "the quick brown fox jumps over the lazy cat and runs away fast".split()
    t3 = "completely unrelated text about database query optimization plans".split()
    h1, h2, h3 = K.simhash64(t1), K.simhash64(t2), K.simhash64(t3)
    assert K.hamming64(h1, h2) < K.hamming64(h1, h3)
    assert K.hamming64(h1, h1) == 0
    assert -(1 << 63) <= h1 < (1 << 63)


# --- image codec / phash / psnr ---------------------------------------------

def test_image_roundtrip_lossless():
    px = K.synth_pixels("http://img.example.com/1")
    payload = K.encode_image(px, "png")
    out = K.decode_image(payload)
    assert np.array_equal(px, out)
    assert K.psnr(px, out) == float("inf")


def test_image_roundtrip_lossy_psnr_over_40db():
    px = K.synth_pixels("http://img.example.com/2")
    out = K.decode_image(K.encode_image(px, "jpeg"))
    assert out.shape == px.shape
    assert K.psnr(px, out) >= 40.0  # input_hint invariant


def test_phash_stable_and_sensitive():
    px = K.synth_pixels("http://img.example.com/3")
    assert K.phash64(px) == K.phash64(px)
    lossy = K.decode_image(K.encode_image(px, "jpeg"))
    assert K.hamming64(K.phash64(px), K.phash64(lossy)) <= 4
    other = K.synth_pixels("http://img.example.com/4")
    assert K.phash64(px) != K.phash64(other)


def test_decode_unknown_magic_raises():
    with pytest.raises(NotImplementedError):
        K.decode_image(b"JPEG00640064" + b"\x00" * 100)


# ---------------------------------------------------------------------------
# XML feed parse (S11 + F9)
# ---------------------------------------------------------------------------

def test_strip_xml_namespaces_matches_reference_replace():
    """Ref behavior (video_scraper.rs:145-149) is a blanket string replace
    — including inside xmlns attribute names — and must be idempotent."""
    from crawler_spark.kernels import strip_xml_namespaces

    s = '<feed xmlns:yt="u"><yt:videoId>x</yt:videoId><media:group/></feed>'
    out = strip_xml_namespaces(s)
    # tag prefixes go; the xmlns:yt attribute is untouched ('yt:' never
    # occurs inside it — the colon PRECEDES yt), exactly like the ref
    assert out == '<feed xmlns:yt="u"><ytvideoId>x</ytvideoId><mediagroup/></feed>'
    assert strip_xml_namespaces(out) == out


def test_parse_feed_entries_typed_fields():
    from crawler_spark.kernels import parse_feed_entries

    xml = (
        '<feed xmlns:yt="u" xmlns:media="m">'
        "<entry><yt:videoId>v-1</yt:videoId><title>a b</title>"
        "<published>2023-05-01T10:00:00+00:00</published>"
        '<media:group><media:statistics views="42"/></media:group></entry>'
        "<entry><yt:videoId>v-2</yt:videoId><title>c</title>"
        "<published>1600000000</published>"
        '<media:statistics views="7"/></entry>'
        "</feed>"
    )
    out = parse_feed_entries(xml)
    assert [e["item_id"] for e in out] == ["v-1", "v-2"]
    assert out[0]["views"] == 42 and out[1]["views"] == 7
    assert out[0]["published_epoch"] == 1682935200  # RFC-3339 path
    assert out[1]["published_epoch"] == 1600000000  # epoch-digits path
    assert parse_feed_entries("<feed></feed>") == []
    assert parse_feed_entries(None) == []


def test_feed_xml_roundtrip_synth():
    """synth feed -> XML string -> parse recovers the exact items (the
    simulator and engine share both sides, so this IS the parity kernel)."""
    from crawler_spark import kernels, synth

    checked = 0
    for i in range(30):
        url = synth.url_of_index(i)
        items = synth.feed_items_for_url(url)
        parsed = kernels.parse_feed_entries(synth.feed_xml_for_url(url))
        assert len(parsed) == len(items)
        for p, it in zip(parsed, items):
            assert p == {
                "item_id": it["item_id"], "title": it["title"],
                "published_epoch": it["published_epoch"], "views": it["views"],
            }
        checked += len(items)
    assert checked > 20


# --- audio codec / features -------------------------------------------------

def test_audio_roundtrip_and_features():
    s = K.synth_audio("http://a.example.com/1")
    out, rate = K.decode_audio(K.encode_audio(s))
    assert rate == 16_000
    assert np.array_equal(s, out)
    f = K.audio_features(out, rate)
    assert 0.2 <= f["duration_s"] <= 1.0
    assert -120.0 < f["rms_dbfs"] < 0.0
    assert 0.0 < f["zcr"] < 1.0
    assert 0 < f["peak"] <= 32767
    # deterministic: same id -> same clip
    assert np.array_equal(s, K.synth_audio("http://a.example.com/1"))


def test_audio_unknown_magic_raises():
    with pytest.raises(NotImplementedError):
        K.decode_audio(b"RIFF" + b"\x00" * 64)


def test_audio_empty_features():
    f = K.audio_features(np.array([], dtype="int16"), 16_000)
    assert f == {"duration_s": 0.0, "rms_dbfs": -120.0, "zcr": 0.0, "peak": 0}


# --- video codec / frame sampling -------------------------------------------

def test_video_roundtrip_and_sampling():
    v = K.synth_video("http://v.example.com/1")
    out = K.decode_video(K.encode_video(v))
    assert np.array_equal(v, out)
    idx = K.sample_frames(out, every_k=3)
    assert idx[0] == 0 and idx[-1] == out.shape[0] - 1
    assert idx == sorted(set(idx))
    # frames differ (moving square + drift) so per-frame phashes do too
    if out.shape[0] >= 4:
        assert K.phash64(out[0]) != K.phash64(out[3])


def test_video_unknown_magic_raises():
    with pytest.raises(NotImplementedError):
        K.decode_video(b"ftypmp42" + b"\x00" * 64)


# --- codec property tests (hypothesis) --------------------------------------

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 40), st.integers(1, 40), st.integers(0, 2**32 - 1))
def test_image_codec_roundtrip_property(h, w, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w)).astype("uint8")
    assert np.array_equal(K.decode_image(K.encode_image(px, "png")), px)
    lossy = K.decode_image(K.encode_image(px, "jpeg"))
    assert lossy.shape == px.shape
    assert int(np.abs(lossy.astype("int64") - px.astype("int64")).max()) <= 2


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2000), st.sampled_from([8000, 16000, 44100]))
def test_audio_codec_roundtrip_property(n, rate):
    rng = np.random.default_rng(n * 31 + rate)
    s = rng.integers(-32768, 32768, size=n).astype("int16")
    out, r = K.decode_audio(K.encode_audio(s, rate))
    assert r == rate and np.array_equal(out, s)
    f = K.audio_features(out, r)
    assert f["duration_s"] == pytest.approx(n / rate)
    assert 0 <= f["peak"] <= 32768


@settings(max_examples=15, deadline=None)
@given(st.integers(1, 10), st.integers(1, 24), st.integers(1, 24), st.integers(1, 6))
def test_video_codec_and_sampling_property(n, h, w, k):
    rng = np.random.default_rng(n * 1009 + h * 31 + w * 7 + k)
    v = rng.integers(0, 256, size=(n, h, w)).astype("uint8")
    assert np.array_equal(K.decode_video(K.encode_video(v)), v)
    idx = K.sample_frames(v, every_k=k)
    assert idx[0] == 0 and idx[-1] == n - 1
    assert all(0 <= i < n for i in idx) and idx == sorted(set(idx))
