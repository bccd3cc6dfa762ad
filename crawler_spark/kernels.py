"""Pure, vectorized parity-critical kernels.

Every function here is deterministic, side-effect free, and vectorized
(numpy / pandas) so it can be unit-tested without Spark and reused inside
pandas/Arrow UDFs (never per-row Python in the hot path).

Reference-parity citations point into /root/reference (read-only):
  - staleness policy      src/scraper/video_scraper.rs:99-130
  - quota day roll        src/repos/apikeys_repo.rs:39-67
  - keyword tokenizer     src/utils/keyword_utils.rs:3-18
  - term classifier       src/services/sailing_terms_service.rs:37-77
  - URL building inverse  src/services/youtube_service.rs:30-33,85-92
  - language whitelist    src/scraper/channel_scraper.rs:170-199
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# URL canonicalization + hashing
# ---------------------------------------------------------------------------

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}


def canonicalize_url(url: str) -> str:
    """Canonical form: lowercase scheme/host, strip default port, drop
    fragment, sort query params, normalize empty path to '/'.

    Generalizes the reference's URL construction (the reference only ever
    *builds* URLs — youtube_service.rs:30-33,85-92); the crawl engine needs
    the inverse so the URL-seen set keys on one canonical spelling.
    """
    s = urlsplit(url.strip())
    scheme = s.scheme.lower()
    host = s.hostname.lower() if s.hostname else ""
    port = s.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = s.path or "/"
    # collapse duplicate slashes, resolve trailing '/.' — keep it simple
    path = re.sub(r"/{2,}", "/", path)
    query = urlencode(sorted(parse_qsl(s.query, keep_blank_values=True)))
    return urlunsplit((scheme, netloc, path, query, ""))


def canonicalize_urls(urls: pd.Series) -> pd.Series:
    """Vectorized canonicalization for use inside a pandas UDF."""
    return urls.map(canonicalize_url)


def url_hash64(url: str) -> int:
    """Deterministic 60-bit hash of a (canonical) URL.

    Uses the first 15 hex chars of md5 so the SAME value is computable in
    Spark SQL (``conv(substring(md5(u),1,15),16,10)``) and in DuckDB
    (``('0x' || substr(md5(u),1,15))::BIGINT``) — portability is what makes
    the seen-set oracle-checkable.
    """
    return int(hashlib.md5(url.encode("utf-8")).hexdigest()[:15], 16)


def url_hashes64(urls: pd.Series) -> pd.Series:
    return urls.map(url_hash64).astype("int64")


def host_of(url: str) -> str:
    return (urlsplit(url).hostname or "").lower()


# ---------------------------------------------------------------------------
# Staleness / recrawl-priority policy (video_scraper.rs:99-130)
# ---------------------------------------------------------------------------

WEEK = 7 * 24 * 3600
_STALENESS_BUCKETS = (  # (min_age_secs, refresh_threshold_secs)
    (24 * WEEK, 4 * WEEK),   # >= 24 weeks old -> refresh every 4 weeks
    (4 * WEEK, WEEK),        # >= 4 weeks old  -> every week
    (WEEK, 24 * 3600),       # >= 1 week old   -> every day
    (0, 3 * 3600),           # < 1 week old    -> every 3 hours
)


def staleness_threshold_secs(age_secs):
    """Refresh threshold for an item of the given age.

    Exact truth table of the reference (video_scraper.rs:107-120):
    <1w -> 3h, >=1w -> 1d, >=4w -> 1w, >=24w -> 4w. Vectorized (numpy).
    """
    age = np.asarray(age_secs, dtype="int64")
    out = np.full(age.shape, 3 * 3600, dtype="int64")
    out = np.where(age >= WEEK, 24 * 3600, out)
    out = np.where(age >= 4 * WEEK, WEEK, out)
    out = np.where(age >= 24 * WEEK, 4 * WEEK, out)
    return out


def should_refresh(age_secs, since_update_secs, is_new):
    """Reference P9: update iff new OR time-since-last-update >= threshold
    (video_scraper.rs:99-130)."""
    thr = staleness_threshold_secs(age_secs)
    return np.asarray(is_new, dtype=bool) | (
        np.asarray(since_update_secs, dtype="int64") >= thr
    )


# ---------------------------------------------------------------------------
# Politeness quota day-roll (apikeys_repo.rs:39-67)
# ---------------------------------------------------------------------------

def quota_roll(used_quota, quota_day, today, inc=1):
    """Pacific-day quota semantics of the reference: if the stored day is
    older than today, reset usage to `inc` and stamp today; else add `inc`
    (apikeys_repo.rs:46-59). Vectorized; returns (new_used, new_day)."""
    used = np.asarray(used_quota, dtype="int64")
    day = np.asarray(quota_day, dtype="int64")
    today = np.asarray(today, dtype="int64")
    inc = np.asarray(inc, dtype="int64")
    rolled = day < today
    new_used = np.where(rolled, inc, used + inc)
    new_day = np.where(rolled, today, day)
    return new_used, new_day


# ---------------------------------------------------------------------------
# Keyword tokenizer (keyword_utils.rs:3-18) — quoted phrases kept whole
# ---------------------------------------------------------------------------

_KEYWORD_RE = re.compile(r'["].+?["]|[^ ]+')
_STRIP_RE = re.compile(r'["\\]')


def tokenize_keywords(s: str) -> list[str]:
    """Reference F3: regex `["].+?["]|[^ ]+` then strip `"` and `\\`
    (keyword_utils.rs:3-18; its two unit tests are ported verbatim in
    tests/test_kernels.py)."""
    if s is None:
        return []
    return [_STRIP_RE.sub("", m) for m in _KEYWORD_RE.findall(s)]


# ---------------------------------------------------------------------------
# Term classifier with blacklist precedence (sailing_terms_service.rs:37-77)
# ---------------------------------------------------------------------------

def classify_terms(
    titles: pd.Series,
    descriptions: pd.Series,
    terms: list[str],
    ignore_terms: pd.Series | bool = False,
    blacklisted: pd.Series | bool = False,
) -> pd.Series:
    """Admission verdict per row.

    Precedence, exactly as the reference:
      1. blacklisted  -> False (sailing_terms_service.rs:64-71)
      2. ignore_terms -> True  (the `ignoreSailingTerm` override, :41-45)
      3. any term substring-matches lower(title) or lower(description)
         (:47-54, early-exit loop -> vectorized any()).
    """
    text = (titles.fillna("") + "\n" + descriptions.fillna("")).str.lower()
    hit = pd.Series(False, index=text.index)
    for t in terms:
        hit = hit | text.str.contains(re.escape(t.lower()), regex=True)
    ign = (
        ignore_terms
        if isinstance(ignore_terms, pd.Series)
        else pd.Series(ignore_terms, index=text.index)
    )
    bl = (
        blacklisted
        if isinstance(blacklisted, pd.Series)
        else pd.Series(blacklisted, index=text.index)
    )
    return (~bl.astype(bool)) & (ign.astype(bool) | hit)


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic) — replaces whatlang
# (channel_scraper.rs:170-199): deterministic, vectorized, 15-code whitelist
# ---------------------------------------------------------------------------

LANG_WHITELIST = [
    "en", "de", "es", "fr", "it", "pt", "nl", "sv", "no", "da",
    "fi", "pl", "ru", "tr", "cs",
]

_LANG_STOPWORDS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to ", " is ", " in "],
    "de": [" der ", " die ", " und ", " das ", " ist ", " nicht "],
    "es": [" el ", " la ", " los ", " que ", " es ", " y "],
    "fr": [" le ", " la ", " les ", " est ", " et ", " une "],
    "it": [" il ", " la ", " che ", " di ", " e ", " per "],
    "pt": [" o ", " a ", " que ", " de ", " e ", " para "],
    "nl": [" de ", " het ", " een ", " en ", " van ", " is "],
}


def detect_language(texts: pd.Series, min_hits: int = 2) -> pd.Series:
    """Stopword-vote language ID. Returns 2-char code or None when the
    best score is below `min_hits` — mirrors the reference's whatlang
    reliability gate + 15-lang whitelist (channel_scraper.rs:174-195)."""
    padded = (" " + texts.fillna("").str.lower() + " ").str.replace(
        r"\s+", " ", regex=True
    )
    best_lang = pd.Series([None] * len(texts), index=texts.index, dtype=object)
    best_score = pd.Series(0, index=texts.index)
    for lang, words in _LANG_STOPWORDS.items():
        score = pd.Series(0, index=texts.index)
        for w in words:
            score = score + padded.str.count(re.escape(w))
        better = score > best_score
        best_lang = best_lang.where(~better, lang)
        best_score = best_score.where(~better, score)
    reliable = best_score >= min_hits
    return best_lang.where(reliable, None)


# ---------------------------------------------------------------------------
# Text quality / token counting / fingerprinting (training-data ops)
# ---------------------------------------------------------------------------

_BPE_ISH_RE = re.compile(r"\w+|[^\w\s]")
_EN_STOP = frozenset(
    "the and of to is in a for on with that this it as are was at by an be".split()
)


def token_count(texts: pd.Series) -> pd.Series:
    """Whitespace+punctuation ("BPE-ish") token count."""
    return texts.fillna("").map(lambda s: len(_BPE_ISH_RE.findall(s)))


def quality_score(texts: pd.Series) -> pd.DataFrame:
    """Length / punctuation-ratio / stopword-ratio quality features.

    Returns DataFrame(n_chars, n_tokens, punct_ratio, stopword_ratio,
    quality) — `quality` is a [0,1] composite used as a corpus filter.
    """
    t = texts.fillna("")
    n_chars = t.str.len()
    tokens = t.map(lambda s: _BPE_ISH_RE.findall(s))
    n_tokens = tokens.map(len)
    n_punct = tokens.map(lambda ts: sum(1 for x in ts if not x[0].isalnum() and x[0] != "_"))
    n_stop = tokens.map(lambda ts: sum(1 for x in ts if x.lower() in _EN_STOP))
    punct_ratio = (n_punct / n_tokens.clip(lower=1)).astype(float)
    stop_ratio = (n_stop / n_tokens.clip(lower=1)).astype(float)
    quality = (
        (n_chars.clip(upper=2000) / 2000.0) * 0.4
        + (1.0 - punct_ratio.clip(upper=0.5) * 2.0) * 0.3
        + stop_ratio.clip(upper=0.5) * 2.0 * 0.3
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars.astype("int64"),
            "n_tokens": n_tokens.astype("int64"),
            "punct_ratio": punct_ratio,
            "stopword_ratio": stop_ratio,
            "quality": quality.astype(float),
        }
    )


def word_shingles(text: str, k: int = 3) -> list[str]:
    """k-word shingles over whitespace tokens (dedup features)."""
    toks = (text or "").lower().split()
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def fingerprint_winnow(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing document fingerprint (Schleimer et al., SIGMOD'03): rolling
    k-gram hashes, keep the min of each sliding window (rightmost min)."""
    toks = (text or "").lower().split()
    if not toks:
        return []
    grams = [" ".join(toks[i : i + k]) for i in range(max(1, len(toks) - k + 1))]
    hs = [url_hash64(g) for g in grams]
    if len(hs) <= window:
        return [min(hs)]
    out: list[int] = []
    for i in range(len(hs) - window + 1):
        w = hs[i : i + window]
        m = min(w)
        # rightmost occurrence of the min, per winnowing spec
        pos = i + max(j for j, v in enumerate(w) if v == m)
        if not out or (pos, m) != out[-1]:
            out.append((pos, m))
    return sorted({m for _, m in out})


# ---------------------------------------------------------------------------
# MinHash / SimHash (near-dup features) — md5-based, engine-portable
# ---------------------------------------------------------------------------

def minhash_signature(shingles: list[str], num_hashes: int = 16) -> list[int]:
    """MinHash signature: h_i(S) = min over shingles of md5(i || ':' || s).

    md5-seeded so Spark SQL and DuckDB can reproduce every lane exactly
    (same trick as url_hash64); empty input -> all lanes = 2^60-1.
    """
    empty = (1 << 60) - 1
    if not shingles:
        return [empty] * num_hashes
    sig = []
    for i in range(num_hashes):
        prefix = f"{i}:"
        sig.append(min(url_hash64(prefix + s) for s in shingles))
    return sig


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash (Charikar'02): sum +/-1 per bit of each token's md5-
    derived 64-bit hash, take sign. Deterministic, no weights."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype="int64")
    for t in tokens:
        h = int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16)
        bits = np.array([(h >> i) & 1 for i in range(64)], dtype="int64")
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out - (1 << 63) if out >= (1 << 63) else out  # signed 64-bit


def hamming64(a: int, b: int) -> int:
    return int(bin((a ^ b) & ((1 << 64) - 1)).count("1"))


# ---------------------------------------------------------------------------
# Image codec (deterministic fake) + phash + PSNR
# ---------------------------------------------------------------------------
# Real JPEG/PNG decode is STUBBED (no image libs in this container). The
# fake codec keeps the Spark-side plumbing real: binary payloads, typed
# metadata, Arrow-batched decode, PSNR>=40dB lossy invariant (input_hint).

_MAGIC_RAW = b"CSRW"   # lossless: raw uint8 pixels
_MAGIC_LOSSY = b"CSLY"  # lossy: 6-bit quantized pixels (PSNR ~ 43 dB)


def encode_image(pixels: np.ndarray, fmt: str = "png") -> bytes:
    """Encode HxW uint8 grayscale pixels. 'png' -> lossless raw container,
    'jpeg' -> 6-bit quantization (deterministic lossy stand-in)."""
    h, w = pixels.shape
    header = (b"%s%04d%04d" % (_MAGIC_LOSSY if fmt == "jpeg" else _MAGIC_RAW, h, w))
    if fmt == "jpeg":
        q = (pixels.astype("uint16") >> 2).astype("uint8")
        return header + q.tobytes()
    return header + pixels.astype("uint8").tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a payload produced by encode_image. Real JPEG/PNG payloads
    would dispatch to an image library here."""
    magic = payload[:4]
    if magic not in (_MAGIC_RAW, _MAGIC_LOSSY):
        raise NotImplementedError(
            "real JPEG/PNG decode requires an image library not present in "
            "this container; only the deterministic CSRW/CSLY containers are "
            "supported"
        )
    h, w = int(payload[4:8]), int(payload[8:12])
    body = np.frombuffer(payload[12:], dtype="uint8").reshape(h, w)
    if magic == _MAGIC_LOSSY:
        return (body.astype("uint16") << 2).astype("uint8") + 2  # mid-point dequant
    return body.copy()


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: 8x8 block-mean aHash (mean-threshold).

    Deterministic and shift-tolerant enough for corpus dedup; plays the
    role of the reference's normalize step (channel_scraper.rs:91-129) for
    the image payload per input_hint.
    """
    h, w = pixels.shape
    if h < 8 or w < 8:  # degenerate thumbnails: upsample so no block is empty
        pixels = np.repeat(np.repeat(pixels, -(-8 // h), axis=0), -(-8 // w), axis=1)
        h, w = pixels.shape
    ys = np.linspace(0, h, 9, dtype=int)
    xs = np.linspace(0, w, 9, dtype=int)
    # vectorized block means via reduceat: pixel values are integers, so
    # the float64 sums are exact and order-independent — bit-identical to
    # the per-block .mean() loop, ~10x faster in the decode hot path
    px = pixels.astype("int64")
    row_sums = np.add.reduceat(px, ys[:-1], axis=0)
    block_sums = np.add.reduceat(row_sums, xs[:-1], axis=1)
    counts = np.outer(np.diff(ys), np.diff(xs))
    blocks = block_sums / counts
    bits = (blocks > np.median(blocks)).flatten()
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out - (1 << 63) if out >= (1 << 63) else out


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    mse = float(np.mean((a.astype("float64") - b.astype("float64")) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)


def synth_pixels(image_id: str, min_side: int = 32, max_side: int = 64) -> np.ndarray:
    """Deterministic per-id pixel matrix: PRNG(image_id) -> gradient +
    per-image 8x8 block pattern + noise (FIXTURES.md §1 recipe).

    The block pattern is the load-bearing part: it gives every image
    DISTINCT coarse structure, so phash64 (8x8 block-mean aHash) assigns
    distant hashes to distinct images (~32-bit Hamming) while re-encoded
    copies of the SAME pixels stay within a few bits. A shared gradient
    alone made every synthetic image one near-dup cluster — degenerate
    for corpus dedup."""
    seed = url_hash64(image_id) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    h = int(rng.integers(min_side, max_side + 1))
    w = int(rng.integers(min_side, max_side + 1))
    gy = np.linspace(0, 255, h)[:, None]
    gx = np.linspace(0, 255, w)[None, :]
    base = (gy * 0.25 + gx * 0.25)
    blocks = rng.integers(0, 128, size=(8, 8)).astype("float64")
    pat = np.repeat(
        np.repeat(blocks, -(-h // 8), axis=0), -(-w // 8), axis=1
    )[:h, :w]
    noise = rng.integers(0, 32, size=(h, w))
    return np.clip(base + pat + noise, 0, 255).astype("uint8")


# ---------------------------------------------------------------------------
# XML feed parse (SURVEY §2.1 S11 + §2.8 F9 + §2.10 #3)
# ---------------------------------------------------------------------------

def strip_xml_namespaces(payload: str) -> str:
    """F9: blanket un-prefixing of the feed's namespaces EXACTLY like the
    reference's string replace (src/scraper/video_scraper.rs:145-149:
    'yt:'->'yt', 'media:'->'media') — it also mangles the xmlns attribute
    names, which is fine: the point is making tags acceptable to a
    namespace-unaware parser. Idempotent. The Spark path runs the same
    substitution as a Catalyst regexp_replace (operators.parse)."""
    return payload.replace("yt:", "yt").replace("media:", "media")


def parse_feed_entries(payload: str) -> list[dict]:
    """S11: parse an XML feed payload string into typed entries
    (ref src/scraper/video_scraper.rs:132-158: strip namespaces, parse,
    one entry per <entry> with video id / title / published / views).
    `published` accepts epoch-seconds digits or an RFC-3339 string
    (ref parses RFC-3339 at video_scraper.rs:39). Pure function reused by
    the vectorized parse UDF and the parity simulator."""
    import xml.etree.ElementTree as ET
    from datetime import datetime, timezone

    if payload is None:
        return []
    root = ET.fromstring(strip_xml_namespaces(payload))
    out = []
    for e in root.iter("entry"):
        vid = e.findtext("ytvideoId")
        title = e.findtext("title")
        pub_raw = e.findtext("published") or ""
        if pub_raw.isdigit():
            published = int(pub_raw)
        else:
            dt = datetime.fromisoformat(pub_raw.replace("Z", "+00:00"))
            published = int(dt.astimezone(timezone.utc).timestamp())
        stats = e.find("mediagroup/mediastatistics")
        if stats is None:
            stats = e.find("mediastatistics")
        views = int(stats.get("views", "0")) if stats is not None else 0
        out.append({
            "item_id": vid,
            "title": title,
            "published_epoch": published,
            "views": views,
        })
    return out


# ---------------------------------------------------------------------------
# Audio codec (deterministic fake) + features
# ---------------------------------------------------------------------------
# Same stub contract as the image codec: real MP3/WAV/OGG decode needs an
# audio library not present in this sandbox, so decode_audio raises
# NotImplementedError for anything but the deterministic CSAU container.
# The Spark-side plumbing (binary column, typed metadata, Arrow-batched
# mapInPandas, explicit fan-out) is real.

_MAGIC_AUDIO = b"CSAU"  # int16 PCM mono: magic + rate(5) + n(8) + samples


def encode_audio(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Encode mono int16 PCM samples into the CSAU container."""
    header = b"%s%05d%08d" % (_MAGIC_AUDIO, rate, samples.shape[0])
    return header + samples.astype("<i2").tobytes()


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a CSAU payload -> (int16 samples, sample_rate). Real
    MP3/WAV payloads would dispatch to an audio library here."""
    if payload[:4] != _MAGIC_AUDIO:
        raise NotImplementedError(
            "real MP3/WAV/OGG decode requires an audio library not present "
            "in this container; only the deterministic CSAU container is "
            "supported"
        )
    rate = int(payload[4:9])
    n = int(payload[9:17])
    samples = np.frombuffer(payload[17:17 + 2 * n], dtype="<i2")
    return samples.copy(), rate


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Feature-extract: duration, RMS loudness (dBFS), zero-crossing
    rate, peak amplitude. All exact integer/float math — deterministic
    across platforms (no FFT libs needed)."""
    n = samples.shape[0]
    if n == 0:
        return {"duration_s": 0.0, "rms_dbfs": -120.0, "zcr": 0.0, "peak": 0}
    x = samples.astype("float64")
    rms = float(np.sqrt(np.mean(x * x)))
    rms_dbfs = -120.0 if rms == 0 else float(20.0 * np.log10(rms / 32768.0))
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    return {
        "duration_s": float(n / rate),
        "rms_dbfs": rms_dbfs,
        "zcr": float(zc / n),
        "peak": int(np.max(np.abs(samples))),
    }


def synth_audio(audio_id: str, rate: int = 16_000) -> np.ndarray:
    """Deterministic per-id PCM clip: two sine partials + noise, 0.2-1.0 s
    (same PRNG-from-id recipe as synth_pixels)."""
    seed = url_hash64("au:" + audio_id) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    n = int(rng.integers(rate // 5, rate + 1))
    t = np.arange(n, dtype="float64") / rate
    f1 = float(rng.integers(80, 2000))
    f2 = float(rng.integers(2000, 7000))
    wave = 0.5 * np.sin(2 * np.pi * f1 * t) + 0.2 * np.sin(2 * np.pi * f2 * t)
    wave += rng.normal(0.0, 0.02, size=n)
    return np.clip(wave * 20000.0, -32768, 32767).astype("int16")


# ---------------------------------------------------------------------------
# Video codec (deterministic fake) + frame sampling
# ---------------------------------------------------------------------------

_MAGIC_VIDEO = b"CSVI"  # magic + n_frames(4) + h(4) + w(4) + frames uint8


def encode_video(frames: np.ndarray) -> bytes:
    """Encode an (n, h, w) uint8 grayscale frame stack into CSVI."""
    n, h, w = frames.shape
    header = b"%s%04d%04d%04d" % (_MAGIC_VIDEO, n, h, w)
    return header + frames.astype("uint8").tobytes()


def decode_video(payload: bytes) -> np.ndarray:
    """Decode a CSVI payload -> (n, h, w) uint8 frames. Real MP4/WebM
    would dispatch to a video library (pyav/ffmpeg) here."""
    if payload[:4] != _MAGIC_VIDEO:
        raise NotImplementedError(
            "real MP4/WebM decode requires a video library not present in "
            "this container; only the deterministic CSVI container is "
            "supported"
        )
    n = int(payload[4:8])
    h, w = int(payload[8:12]), int(payload[12:16])
    return np.frombuffer(payload[16:16 + n * h * w], dtype="uint8").reshape(n, h, w).copy()


def sample_frames(frames: np.ndarray, every_k: int) -> list[int]:
    """Frame-sample indices: every k-th frame plus always the last (scene
    boundaries are synthetic; fixed-stride is the deterministic baseline)."""
    n = frames.shape[0]
    idx = list(range(0, n, every_k))
    if idx and idx[-1] != n - 1:
        idx.append(n - 1)
    return idx


def synth_video(video_id: str, min_frames: int = 4, max_frames: int = 12) -> np.ndarray:
    """Deterministic per-id frame stack: a synth_pixels base frame with a
    per-frame brightness drift and a moving bright square (so frame
    phashes differ and motion statistics are non-trivial)."""
    base = synth_pixels("vf:" + video_id, min_side=32, max_side=48)
    seed = url_hash64("vi:" + video_id) & 0xFFFFFFFF
    rng = np.random.default_rng(seed)
    n = int(rng.integers(min_frames, max_frames + 1))
    h, w = base.shape
    frames = np.empty((n, h, w), dtype="uint8")
    for i in range(n):
        f = base.astype("int64") + 4 * i
        y = (5 * i) % max(h - 8, 1)
        x = (7 * i) % max(w - 8, 1)
        f[y:y + 8, x:x + 8] += 64
        frames[i] = np.clip(f, 0, 255).astype("uint8")
    return frames
