"""Deterministic synthetic web — the crawl target (FIXTURES.md §1-6, 11).

The entire "internet" is a pure function of the URL string: page text,
image payload, caption, outlinks, robots rules and politeness budgets are
all derived from seeded PRNGs keyed by md5 hashes. That means:

  * the Spark fetch stage (vectorized UDF on executors) and the pure-
    Python reference simulator evaluate the SAME web with zero shared
    state and zero I/O — parity tests compare crawl order and seen-set
    exactly (north_rule);
  * any scale is addressable (url index space is unbounded) — the
    10^10-frontier design point just means more indices;
  * host popularity is Zipf-skewed so hot-host politeness and salting
    actually get exercised, like real crawl frontiers.

No external data; everything below is generated (seed 42 lineage via md5).
"""

from __future__ import annotations

from datetime import datetime, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from crawler_spark import kernels
from crawler_spark.schemas import (
    BLACKLIST,
    FILTER_TERMS,
    FRONTIER,
    POLITENESS,
    ROBOTS,
)

N_HOSTS = 64             # synthetic host universe
ZIPF_A = 1.3             # host popularity skew (hot-host exercise)
FILTER_TERM_LIST = ["sailing", "boat", "ocean", "regatta"]
_VOCAB = (
    "wind water deck harbor anchor chart tide crew knot mast sail rope "
    "compass island voyage storm map gear log port"
).split()
_COUNTRIES = ["us", "de", "gb", "fr", "nl", None]


def _rng(key: str) -> np.random.Generator:
    return np.random.default_rng(kernels.url_hash64(key) & 0xFFFFFFFF)


def host_of_index(i: int) -> str:
    """Zipf-skewed host assignment: low host ids absorb most URLs."""
    r = _rng(f"host:{i}")
    h = min(int(r.zipf(ZIPF_A)) - 1, N_HOSTS - 1)
    return f"host{h:03d}.example.com"


def url_of_index(i: int) -> str:
    return f"https://{host_of_index(i)}/page/{i}"


def index_of_url(url: str) -> int:
    return int(url.rsplit("/", 1)[-1])


# image mirroring: URL indices ending 7/8/9 re-host the IMAGE of their
# decade's index-0 page (cross-host mirrors of the same picture), but
# re-encode it under their OWN fmt draw — a png mirror of a jpeg original
# (or vice versa) decodes to near-identical pixels and a near-dup phash.
# This is what gives the engine's corpus real re-encoded near-duplicates
# for the dedup maintenance stage to collapse. Page text/links/caption
# stay keyed by the URL itself (independent PRNG streams), so pop-order
# and feed parity are untouched.
MIRROR_RESIDUES = (7, 8, 9)


def content_url(url: str) -> str:
    """The URL whose pixel stream this page's image is derived from:
    itself, or the decade-base page it mirrors."""
    i = index_of_url(url)
    if i % 10 in MIRROR_RESIDUES:
        return url_of_index(i - i % 10)
    return url


def content_pixels(url: str) -> np.ndarray:
    """SOURCE pixels for a URL's image: the content page's pixels, plus —
    for mirrors — a small deterministic single-block brightness patch (a
    re-hoster's watermark/logo edit). The patch makes mirrors true
    NEAR-duplicates (phash a bit or two off the base, never byte-equal),
    while PSNR checks against THIS function keep measuring codec loss
    only. Patch geometry matches phash64's 8x8 block grid so the edit
    moves at most ~1 block mean."""
    curl = content_url(url)
    base = kernels.synth_pixels(curl)
    if curl == url:
        return base
    r = _rng("mirror:" + url)
    h, w = base.shape
    ys = np.linspace(0, h, 9, dtype=int)
    xs = np.linspace(0, w, 9, dtype=int)
    by, bx = int(r.integers(0, 8)), int(r.integers(0, 8))
    px = base.astype("int16").copy()
    px[ys[by]:ys[by + 1], xs[bx]:xs[bx + 1]] += 32
    return np.clip(px, 0, 255).astype("uint8")


# ---------------------------------------------------------------------------
# page content (what "fetching" a URL returns)
# ---------------------------------------------------------------------------

def page_for_url(url: str, universe: int = 10_000, with_payload: bool = True) -> dict:
    """Deterministic page payload for a URL. `universe` bounds outlink
    targets (the addressable synthetic web for this run).

    `with_payload=False` skips pixel synthesis/encoding (the 'snippet
    fetch' used for candidate classification — ref: discovery classifies
    subscription snippets, not full channel fetches,
    src/crawler/channel_discovery_crawler.rs:66-74). All PRNG draws happen
    unconditionally so both modes see identical text/links."""
    r = _rng("page:" + url)
    has_term = bool(r.random() < 0.7)
    words = list(r.choice(_VOCAB, size=10))
    title_words = list(r.choice(_VOCAB, size=4))
    if has_term:
        t = FILTER_TERM_LIST[int(r.integers(0, len(FILTER_TERM_LIST)))]
        title_words.insert(int(r.integers(0, len(title_words))), t)
    title = " ".join(title_words)
    description = " ".join(words)
    caption = f"{title} | img-{kernels.url_hash64(url) & 0xFFFF}"
    fmt = "jpeg" if r.random() < 0.5 else "png"
    if with_payload:
        # independent PRNG stream; mirrors share the base page's pixels
        # (plus their own watermark patch — see content_pixels)
        pixels = content_pixels(url)
        payload = kernels.encode_image(pixels, fmt)
        w, h = int(pixels.shape[1]), int(pixels.shape[0])
    else:
        payload, w, h = None, 0, 0
    n_links = int(r.integers(2, 9))
    outlinks = [url_of_index(int(x)) for x in r.integers(0, universe, size=n_links)]
    published_epoch = int(1_500_000_000 + r.integers(0, 200_000_000))
    return {
        "title": title,
        "description": description,
        "caption": caption,
        "fmt": fmt,
        "bytes": payload,
        "w": w,
        "h": h,
        "outlinks": outlinks,
        "published_epoch": published_epoch,
        "views": int(r.integers(0, 1_000_000)) if r.random() < 0.97 else 0,
        "subscribers": int(r.integers(0, 100_000)),
        "subscribers_hidden": bool(r.random() < 0.1),
        "country": _COUNTRIES[int(r.integers(0, len(_COUNTRIES)))],
        "keywords_raw": " ".join(words[:3]) + ' "two word"',
    }


_MASK64 = (1 << 64) - 1


def _mix64(x: int) -> int:
    """splitmix64 finalizer — a cheap deterministic stream for per-item
    values (building a full numpy Generator per URL was ~20% of the fetch
    stage's CPU; the feed needs variety, not statistical quality)."""
    x = (x + 0x9E3779B97F4A7C15) & _MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _MASK64
    return x ^ (x >> 31)


def feed_items_for_url(url: str) -> list[dict]:
    """Deterministic per-URL item list (the reference's per-channel video
    feed, src/scraper/video_scraper.rs) — derived from the url hash via
    integer mixing, INDEPENDENT of page_for_url's PRNG stream so the feed
    never perturbs existing page draws (pop-order/corpus parity depends
    on those)."""
    uh = kernels.url_hash64(url)
    n = _mix64(uh) % 6
    nv = len(_VOCAB)
    items = []
    for i in range(n):
        m = _mix64(uh * 6 + i + 1)
        title = " ".join(_VOCAB[(m >> s) % nv] for s in (0, 13, 26))
        items.append({
            "item_id": f"it-{uh & 0xFFFFF:05x}-{i}",
            "title": title,
            "published_epoch": 1_500_000_000 + (m >> 12) % 250_000_000,
            "views": (m >> 40) % 50_000,
        })
    return items


def feed_xml_for_url(url: str) -> str:
    """The raw namespaced XML feed STRING a fetch returns — the engine
    parses it back with the S11/F9 stages (namespace strip + xml->struct
    + explode), exactly the shape the reference consumes
    (videos.xml?channel_id=..., src/scraper/video_scraper.rs:132-158)."""
    from datetime import datetime, timezone

    entries = []
    for it in feed_items_for_url(url):
        rfc = datetime.fromtimestamp(it["published_epoch"], tz=timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%S+00:00"
        )
        entries.append(
            f"<entry><yt:videoId>{it['item_id']}</yt:videoId>"
            f"<title>{it['title']}</title>"
            f"<published>{rfc}</published>"
            f"<media:group><media:statistics views=\"{it['views']}\"/></media:group>"
            f"</entry>"
        )
    return (
        '<feed xmlns:yt="http://www.youtube.com/xml/schemas/2015" '
        'xmlns:media="http://search.yahoo.com/mrss/">' + "".join(entries) + "</feed>"
    )


def fetch_pages(urls: pd.Series, universe: int = 10_000) -> pd.DataFrame:
    """Vectorized batch 'HTTP fetch' — the body of the mapInPandas fetch
    stage (SURVEY §2.10 #2). ~2% of fetches fail deterministically
    (status 503) to exercise the error path (ref scrapeError,
    src/scraper/channel_scraper.rs:148-155)."""
    _none_page = {
        "title": None, "description": None, "caption": None, "fmt": None,
        "bytes": None, "w": None, "h": None, "outlinks": None,
        "published_epoch": None, "views": None, "subscribers": None,
        "subscribers_hidden": None, "country": None, "keywords_raw": None,
        "feed_xml": None,
    }
    rows = []
    for url in urls:
        fail = _rng("err:" + url).random() < 0.02
        if fail:
            rows.append({"url": url, "status": 503, "error": "synthetic 503", **_none_page})
            continue
        p = page_for_url(url, universe)
        p["url"] = url
        p["status"] = 200
        p["error"] = None
        p["feed_xml"] = feed_xml_for_url(url)
        rows.append(p)
    df = pd.DataFrame(rows)
    # keep int-typed columns object-dtyped so None survives (no NaN floats
    # that would break Arrow long conversion)
    for c in ("published_epoch", "views", "subscribers", "w", "h"):
        df[c] = df[c].map(lambda x: int(x) if pd.notna(x) else None).astype(object)
    return df


# ---------------------------------------------------------------------------
# robots / politeness / seeds / deny-list
# ---------------------------------------------------------------------------

def robots_version_at(epoch: int, t0_epoch: int, period_secs: int) -> int:
    """Content version of every host's robots file at `epoch`: the synth
    web rewrites robots once per `period_secs` (0 = never — version 0
    forever, the pre-versioning behavior). Pure arithmetic so engine and
    simulator derive the same version from the same injected clock."""
    if period_secs <= 0:
        return 0
    return max(0, (epoch - t0_epoch) // period_secs)


def robots_rules_for_host(host: str, version: int = 0) -> list[dict]:
    """Deterministic robots rules: ~25% of hosts disallow a path-prefix
    band of their /page/ space; everything else allowed (longest-prefix
    wins, evaluated by operators.robots). version>0 redraws from an
    independent PRNG stream (robots refetch staleness); version 0 is the
    original stream, so enabling versioning never shifts existing draws."""
    key = "robots:" if version == 0 else f"robots:v{version}:"
    r = _rng(key + host)
    rules = [{"allow": True, "path_prefix": "/"}]
    if r.random() < 0.25:
        digit = int(r.integers(0, 10))
        rules.append({"allow": False, "path_prefix": f"/page/{digit}"})
    return rules


def robots_directives_for_host(host: str, version: int = 0) -> dict:
    """Deterministic non-rule robots directives (independent PRNG stream
    from the rules so adding them never perturbs rule draws):
    ~20% of hosts declare a Crawl-delay (enforced through the politeness
    ledger as the stricter of ledger min-delay and the directive), ~15%
    declare two Sitemap URLs on their own host (surfaced as depth-1
    discovery candidates the first time the host is popped). version>0
    redraws both directives from a fresh stream (see robots_version_at)."""
    key = "robotsdir:" if version == 0 else f"robotsdir:v{version}:"
    r = _rng(key + host)
    crawl_delay_ms = None
    if r.random() < 0.20:
        crawl_delay_ms = int(r.choice([1000, 2000, 4000]))
    sitemaps: list[str] = []
    if r.random() < 0.15:
        ks = sorted({int(k) for k in r.integers(0, 50, size=2)})
        sitemaps = [f"https://{host}/sitemap/{k}" for k in ks]
    return {"crawl_delay_ms": crawl_delay_ms, "sitemap_urls": sitemaps}


def politeness_budget_for_host(host: str) -> dict:
    r = _rng("quota:" + host)
    return {
        "daily_quota": int(r.integers(40, 200)),
        "min_delay_ms": int(r.choice([100, 250, 500])),
    }


def robots_allowed(url: str, version: int = 0) -> bool:
    """Pure-Python robots verdict (longest matching prefix wins) — shared
    by simulator and tests; the Spark path computes the same thing
    set-wise in operators.robots. `version` selects the host's robots
    content generation (the simulator passes its per-host FETCHED
    version, mirroring the engine's robots-table-as-of-last-fetch)."""
    s_host = kernels.host_of(url)
    path = "/" + url.split("://", 1)[-1].split("/", 1)[-1]
    best, verdict = -1, True
    for rule in robots_rules_for_host(s_host, version):
        p = rule["path_prefix"]
        if path.startswith(p) and len(p) > best:
            best, verdict = len(p), rule["allow"]
    return verdict


def seed_urls(n_seeds: int = 32, universe: int = 10_000) -> list[str]:
    """The reference's `additional` seed list equivalent: deterministic
    sample of the URL universe (src/crawler/additional_channel_crawler.rs)."""
    r = _rng(f"seeds:{n_seeds}:{universe}")
    idx = sorted(set(int(x) for x in r.integers(0, universe, size=n_seeds * 2)))[:n_seeds]
    return [url_of_index(i) for i in idx]


def blacklist_hashes(universe: int = 10_000, frac: float = 0.01) -> list[int]:
    """Deterministic deny-list: ~1% of the universe (ref `blacklist`)."""
    r = _rng(f"blacklist:{universe}")
    idx = sorted(set(int(x) for x in r.integers(0, universe, size=int(universe * frac))))
    return [kernels.url_hash64(kernels.canonicalize_url(url_of_index(i))) for i in idx]


# ---------------------------------------------------------------------------
# Spark DataFrame builders (initial store state)
# ---------------------------------------------------------------------------

def frontier_row(url: str, source: str, priority: int, as_of_epoch: int, depth: int = 0) -> dict:
    cu = kernels.canonicalize_url(url)
    host = kernels.host_of(cu)
    return {
        "url": cu,
        "url_hash": _i64(kernels.url_hash64(cu)),
        "host": host,
        "host_hash": _i64(kernels.url_hash64(host)),
        "priority": priority,
        "next_fetch_ts": pd.Timestamp(as_of_epoch, unit="s"),
        "last_fetch_ts": None,
        "source": source,
        "ignore_filter_terms": source == "seed",
        "depth": depth,
    }


def _i64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def build_seed_frontier(
    spark: SparkSession, n_seeds: int, as_of_epoch: int, universe: int = 10_000
) -> DataFrame:
    rows = [frontier_row(u, "seed", 0, as_of_epoch) for u in seed_urls(n_seeds, universe)]
    return spark.createDataFrame(pd.DataFrame(rows), FRONTIER)


def robots_row_for_host(host: str, version: int = 0, fetched_epoch: int = 0) -> dict:
    """One robots-table row at a given content version — shared by the
    bootstrap build (version 0, fetched at epoch 0) and the scheduler's
    refetch MERGE (version at the refetch tick)."""
    d = robots_directives_for_host(host, version)
    return {
        "host_hash": _i64(kernels.url_hash64(host)),
        "rules": [(r["allow"], r["path_prefix"])
                  for r in robots_rules_for_host(host, version)],
        "fetched_ts": datetime.fromtimestamp(
            fetched_epoch, tz=timezone.utc
        ).replace(tzinfo=None),
        "crawl_delay_ms": d["crawl_delay_ms"],
        "sitemap_urls": d["sitemap_urls"],
    }


def build_robots(spark: SparkSession) -> DataFrame:
    rows = [
        robots_row_for_host(f"host{h:03d}.example.com") for h in range(N_HOSTS)
    ]
    return spark.createDataFrame(rows, ROBOTS)


def build_politeness(spark: SparkSession) -> DataFrame:
    rows = []
    for h in range(N_HOSTS):
        host = f"host{h:03d}.example.com"
        b = politeness_budget_for_host(host)
        rows.append({
            "host_hash": _i64(kernels.url_hash64(host)),
            "used_quota": 0,
            "daily_quota": b["daily_quota"],
            "quota_day": 0,
            "min_delay_ms": b["min_delay_ms"],
        })
    return spark.createDataFrame(rows, POLITENESS)


def build_filter_terms(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([(t,) for t in FILTER_TERM_LIST], FILTER_TERMS)


def build_blacklist(spark: SparkSession, universe: int = 10_000) -> DataFrame:
    return spark.createDataFrame(
        [(_i64(h),) for h in blacklist_hashes(universe)], BLACKLIST
    )
