"""Single-threaded reference-semantics simulator (SURVEY §5.3).

Implements the crawl loop's EXACT semantics in plain Python over the same
deterministic synthetic web — the parity oracle the Spark engine must
match batch-for-batch (north_rule: same seed list + politeness budget ⇒
same crawl ordering and same final URL-seen set):

  * pop order: total order (priority asc, next_fetch_ts asc, url_hash
    asc), at most k per host per batch, capped by the host's politeness
    budget (ref channel_repo.rs:74-108 + apikeys quota);
  * fetch: pure page function; ~2% deterministic 503s;
  * staleness policy: next_fetch = as_of + threshold(page age)
    (video_scraper.rs:99-130), error backoff 6 h;
  * admission: robots longest-prefix → not-seen → blacklist > ignore >
    term-match precedence (sailing_terms_service.rs:37-77); rejected
    URLs enter the negative cache forever (nonsailingchannels);
  * politeness: inc-or-reset on Pacific-day roll (apikeys_repo.rs:39-67).

Everything is pure-Python dict/list state — no Spark imports.
"""

from __future__ import annotations

from datetime import datetime, timezone
from zoneinfo import ZoneInfo

import pandas as pd

from crawler_spark import kernels, synth

_PT = ZoneInfo("America/Los_Angeles")
PRIORITY_SEED = 0
PRIORITY_DISCOVERY = 1
PRIORITY_UPDATE = 2


def pacific_day(epoch: int) -> int:
    return int(
        datetime.fromtimestamp(epoch, tz=timezone.utc).astimezone(_PT).strftime("%Y%m%d")
    )


def pagerank_py(edges: dict[tuple[int, int], int], iters: int = 5, d: float = 0.85) -> dict[int, float]:
    """Pure-Python twin of queries_graph.pagerank_over_edges: same
    uniform init, self-loop drop, IEEE int/int out-weight division,
    per-iteration round(x + 1e-12, 9) and final round(r + 1e-9, 6) —
    the rounding discipline that makes sum-order differences between
    engines unobservable (the same contract the DuckDB oracle relies
    on)."""
    nodes = sorted({s for s, _ in edges} | {t for _, t in edges})
    nn = len(nodes)
    if nn == 0:
        return {}
    out: dict[int, int] = {}
    for (s, t), w in edges.items():
        if s != t:
            out[s] = out.get(s, 0) + w
    wn = {(s, t): w / out[s] for (s, t), w in edges.items() if s != t}
    r = {h: 1.0 / nn for h in nodes}
    for _ in range(iters):
        contrib: dict[int, float] = {}
        for (s, t), x in wn.items():
            contrib[t] = contrib.get(t, 0.0) + r[s] * x
        r = {h: round((1.0 - d) / nn + d * contrib.get(h, 0.0) + 1e-12, 9)
             for h in nodes}
    return {h: round(r[h] + 1e-9, 6) for h in nodes}


def decayed_edges_py(
    ep_edges: dict[tuple[int, int, int], int], cur_epoch: int, window: int,
    decay: float = 0.5,
) -> dict[tuple[int, int], float]:
    """Pure-Python twin of queries_graph.decayed_weights: truncated
    exponential decay over epoch-tagged integer counts. With decay a
    power of two, every product/sum is a dyadic rational exact in IEEE
    double — identical to the engine's SQL sum regardless of order."""
    out: dict[tuple[int, int], float] = {}
    for (s, t, e), w in ep_edges.items():
        if e <= cur_epoch - window:
            continue
        k = (s, t)
        out[k] = out.get(k, 0.0) + w * decay ** (cur_epoch - e)
    return out


class CrawlSimulator:
    def __init__(
        self,
        universe: int = 10_000,
        n_seeds: int = 32,
        k_per_host: int = 8,
        tick_secs: int = 6 * 3600,
        t0_epoch: int = 1_700_000_000,
        discovery_interval_secs: int = 0,
        recrawl_interval_secs: int = 0,
        adaptive_pop_caps: bool = False,
        robots_ttl_secs: int = 0,
        robots_change_period_secs: int = 0,
        maintenance_every: int = 0,
        rank_pop_boost: bool = False,
        host_rank_decay: bool = False,
        host_rank_decay_window: int = 16,
    ):
        self.universe = universe
        self.k_per_host = k_per_host
        # mirror of frontier.pop(adaptive=True): per-host cap scales with
        # the decade of the host's READY queue depth (digits of the count)
        self.adaptive_pop_caps = adaptive_pop_caps
        self.tick_secs = tick_secs
        self.t0_epoch = t0_epoch
        self.batch_id = 0
        # per-producer cadence watermarks (ref channel_discovery_crawler.rs
        # :109-118 / channel_update_crawler.rs:12; 0 = every batch)
        self.discovery_interval_secs = discovery_interval_secs
        self.recrawl_interval_secs = recrawl_interval_secs
        self.last_discovery_epoch: int | None = None
        self.last_recrawl_epoch: int | None = None
        self.terms = synth.FILTER_TERM_LIST
        self.blacklist = set(synth.blacklist_hashes(universe))
        # frontier: url_hash -> row dict
        self.frontier: dict[int, dict] = {}
        # seen: url_hash -> verdict
        self.seen: dict[int, str] = {}
        # politeness: host_hash -> [used, daily, day]
        self.politeness: dict[int, list[int]] = {}
        self.min_delay: dict[int, int] = {}
        # robots directives (mirrors operators.politeness.apply_crawl_delay
        # and operators.robots.sitemap_urls_for_hosts)
        self.crawl_delay: dict[int, int] = {}
        self.sitemaps: dict[int, list[str]] = {}
        # robots refetch staleness (mirrors scheduler step 1b): per-host
        # fetched epoch (bootstrap = epoch 0, like build_robots) and the
        # CONTENT version of the last fetch — rules draw at that version
        # in the admission gate, so a stale cache keeps serving its old
        # verdicts exactly like the engine's robots table
        self.robots_ttl_secs = robots_ttl_secs
        self.robots_change_period_secs = robots_change_period_secs
        self.robots_fetched: dict[int, int] = {}
        self.robots_version: dict[int, int] = {}
        self._host_by_hash: dict[int, str] = {}
        for h in range(synth.N_HOSTS):
            host = f"host{h:03d}.example.com"
            b = synth.politeness_budget_for_host(host)
            hh = kernels.url_hash64(host)
            self._host_by_hash[hh] = host
            self.robots_fetched[hh] = 0
            self.robots_version[hh] = 0
            self.politeness[hh] = [0, b["daily_quota"], 0]
            self.min_delay[hh] = b["min_delay_ms"]
            d = synth.robots_directives_for_host(host)
            if d["crawl_delay_ms"]:
                self.crawl_delay[hh] = d["crawl_delay_ms"]
            if d["sitemap_urls"]:
                self.sitemaps[hh] = d["sitemap_urls"]
        # host link graph (mirrors normalize.to_host_edges + the additive
        # host_edges fold): one count per outlink occurrence on a
        # successfully fetched page, dst = canonical host. Always
        # accumulated (pure-Python, cheap); the engine folds it only
        # when maintain_host_graph is on — parity tests compare then.
        self.host_edges: dict[tuple[int, int], int] = {}
        # decayed-rank mirror (scheduler host_rank_decay): epoch-tagged
        # integer counts, epoch = batch_id // maintenance_every; the
        # refresh sums w_e * 0.5^(E-e) over the window — dyadic-exact
        # float math, so sum order can never diverge from the engine
        self.host_rank_decay = host_rank_decay
        self.host_rank_decay_window = int(host_rank_decay_window)
        self.host_edges_ep: dict[tuple[int, int, int], int] = {}
        # rank-boosted pops (mirrors scheduler._rank_boost_hosts +
        # host_rank_upkeep): ranks recompute from host_edges at the same
        # maintenance cadence as the engine, with the SAME per-iteration
        # 9 dp rounding (pagerank_py twins pagerank_over_edges), and the
        # top decile (rank desc, host_hash asc) doubles its pop cap
        self.maintenance_every = maintenance_every
        self.rank_pop_boost = rank_pop_boost
        self._boosted: set[int] = set()
        # corpus: image_id -> dict(caption, phash, fmt, w, h, bytes)
        self.corpus: dict[str, dict] = {}
        # pages: url_hash -> normalized page row (the `channels` document)
        self.pages: dict[int, dict] = {}
        # items: (url_hash, item_id) -> item row (the `videos` collection)
        self.items: dict[tuple[int, str], dict] = {}
        self.pop_log: list[list[int]] = []
        for url in synth.seed_urls(n_seeds, universe):
            cu = kernels.canonicalize_url(url)
            uh = kernels.url_hash64(cu)
            host = kernels.host_of(cu)
            self.frontier[uh] = {
                "url": cu,
                "url_hash": uh,
                "host": host,
                "host_hash": kernels.url_hash64(host),
                "priority": PRIORITY_SEED,
                "next_fetch_epoch": t0_epoch,
                "last_fetch_epoch": None,
                "source": "seed",
                "ignore_filter_terms": True,
                "depth": 0,
            }
            self.seen[uh] = "accepted"

    # ------------------------------------------------------------------

    def _gate(self, as_of: int, last: int | None, interval: int) -> bool:
        return interval <= 0 or last is None or as_of - last >= interval

    def decayed_or_plain_edges(self):
        """Rank-refresh input: decayed weights when the decay mirror is
        on, else the additive-forever counts."""
        if self.host_rank_decay and self.maintenance_every:
            return decayed_edges_py(
                self.host_edges_ep,
                self.batch_id // self.maintenance_every,
                self.host_rank_decay_window,
            )
        return self.host_edges

    def _pop(self, as_of: int, run_recrawl: bool = True) -> list[dict]:
        ready = [
            r for r in self.frontier.values()
            if r["next_fetch_epoch"] <= as_of
            and (run_recrawl or r["last_fetch_epoch"] is None)
        ]
        ready.sort(key=lambda r: (r["priority"], r["next_fetch_epoch"], r["url_hash"]))
        today = pacific_day(as_of)
        depth_per_host: dict[int, int] = {}
        if self.adaptive_pop_caps:
            for r in ready:
                depth_per_host[r["host_hash"]] = depth_per_host.get(r["host_hash"], 0) + 1
        taken_per_host: dict[int, int] = {}
        out = []
        for r in ready:
            hh = r["host_hash"]
            used, daily, day = self.politeness.get(hh, [0, 0, 0])
            budget = daily if day < today else max(daily - used, 0)
            # min-delay rate cap: fetches that fit one batch window;
            # robots Crawl-delay tightens it (stricter of the two)
            eff_delay = max(self.min_delay.get(hh, 1), self.crawl_delay.get(hh, 0))
            rate_cap = (self.tick_secs * 1000) // max(eff_delay, 1)
            base_cap = self.k_per_host * (
                len(str(depth_per_host[hh])) if self.adaptive_pop_caps else 1
            )
            # link-authority boost (mirrors frontier.pop boost_hosts)
            if hh in self._boosted:
                base_cap *= 2
            cap = min(base_cap, budget, rate_cap)
            if taken_per_host.get(hh, 0) < cap:
                taken_per_host[hh] = taken_per_host.get(hh, 0) + 1
                out.append(r)
        return out

    def run_batch(self) -> dict:
        as_of = self.t0_epoch + self.batch_id * self.tick_secs
        today = pacific_day(as_of)
        run_discovery = self._gate(as_of, self.last_discovery_epoch, self.discovery_interval_secs)
        run_recrawl = self._gate(as_of, self.last_recrawl_epoch, self.recrawl_interval_secs)
        if run_discovery and self.discovery_interval_secs > 0:
            self.last_discovery_epoch = as_of
        if run_recrawl and self.recrawl_interval_secs > 0:
            self.last_recrawl_epoch = as_of
        popped = self._pop(as_of, run_recrawl)
        self.pop_log.append([r["url_hash"] for r in popped])

        n_ok = n_err = 0
        fetched_pages = []
        counts: dict[int, int] = {}
        for r in popped:
            url = r["url"]
            # per-PAGE quota charge (ref youtube_service.rs:55-73): one
            # unit for the page itself; discovery pagination adds below
            counts[r["host_hash"]] = counts.get(r["host_hash"], 0) + 1
            r["last_fetch_epoch"] = as_of
            r["priority"] = PRIORITY_UPDATE
            r["source"] = "update"
            if synth._rng("err:" + url).random() < 0.02:
                n_err += 1
                r["next_fetch_epoch"] = as_of + 6 * 3600
                self.pages[r["url_hash"]] = {
                    "title": None, "country": None, "keywords": [],
                    "language": None, "published_epoch": None, "views": None,
                    "subscribers": 0, "item_count": 0, "last_item_epoch": None,
                    "error_msg": "synthetic 503",
                }
                continue
            page = synth.page_for_url(url, self.universe)
            n_ok += 1
            # host-graph edge increments (normalize.to_host_edges mirror)
            for raw in page["outlinks"]:
                dst = kernels.url_hash64(kernels.host_of(kernels.canonicalize_url(raw)))
                k = (r["host_hash"], dst)
                self.host_edges[k] = self.host_edges.get(k, 0) + 1
                if self.host_rank_decay and self.maintenance_every:
                    ke = k + (self.batch_id // self.maintenance_every,)
                    self.host_edges_ep[ke] = self.host_edges_ep.get(ke, 0) + 1
            # pagination pages of the 50-per-page discovery listing
            counts[r["host_hash"]] += -(-len(page["outlinks"]) // 50)
            age = as_of - page["published_epoch"]
            thr = int(kernels.staleness_threshold_secs([age])[0])
            r["next_fetch_epoch"] = as_of + thr
            fetched_pages.append((r, page))
            # per-item sub-pipeline (ref VideoScraper): parse the SAME XML
            # string the engine fetches (shared kernel — S11/F9 parity),
            # J1 lookup + P9 staleness gate, upsert, A1/A3 write-back
            uh = r["url_hash"]
            entries = kernels.parse_feed_entries(synth.feed_xml_for_url(url))
            for e in entries:
                k = (uh, e["item_id"])
                ex = self.items.get(k)
                item_age = as_of - e["published_epoch"]
                ithr = int(kernels.staleness_threshold_secs([item_age])[0])
                if ex is None or as_of - ex["updated_epoch"] >= ithr:
                    self.items[k] = {
                        "title": e["title"],
                        "published_epoch": e["published_epoch"],
                        "updated_epoch": as_of,
                        "views": e["views"],
                    }
            self.pages[uh] = {
                "title": page["title"],
                "country": page["country"].lower() if page["country"] else None,
                "keywords": kernels.tokenize_keywords(page["keywords_raw"]),
                "language": kernels.detect_language(
                    pd.Series([page["title"] + "\n" + page["description"]])
                ).iloc[0],
                "published_epoch": page["published_epoch"],
                "views": page["views"],
                "subscribers": page["subscribers"],
                "item_count": len(entries),
                "last_item_epoch": max((e["published_epoch"] for e in entries), default=None),
                "error_msg": None,
            }
            decoded = kernels.decode_image(page["bytes"])
            self.corpus[url] = {
                "caption": page["caption"],
                "phash": kernels.phash64(decoded),
                "fmt": page["fmt"],
                "w": page["w"],
                "h": page["h"],
                "bytes": page["bytes"],
            }

        # politeness charge (inc-or-reset)
        for hh, n in counts.items():
            used, daily, day = self.politeness[hh]
            if day < today and n > 0:
                self.politeness[hh] = [n, daily, today]
            else:
                self.politeness[hh] = [used + n, daily, day]

        # discovery: all outlinks of this batch, min depth per canonical URL
        cand: dict[str, int] = {}
        if not run_discovery:
            fetched_pages = []
        for r, page in fetched_pages:
            for raw in page["outlinks"]:
                cu = kernels.canonicalize_url(raw)
                d = r["depth"] + 1
                cand[cu] = min(cand.get(cu, d), d)
        # robots Sitemap directives of the batch's POPPED hosts enter the
        # same candidate pool at depth 1 (engine: sitemap_urls_for_hosts
        # merged before the min-depth agg); once-only via the seen cache
        if run_discovery:
            for r in popped:
                for raw in self.sitemaps.get(r["host_hash"], ()):
                    cu = kernels.canonicalize_url(raw)
                    cand[cu] = min(cand.get(cu, 1), 1)
        n_admitted = n_rejected = 0
        for cu in cand:
            uh = kernels.url_hash64(cu)
            # rules at the host's last-FETCHED content version (engine:
            # the robots table row written by the last refetch)
            cand_hh = kernels.url_hash64(kernels.host_of(cu))
            if not synth.robots_allowed(cu, self.robots_version.get(cand_hh, 0)):
                continue
            if uh in self.seen:
                continue
            snippet = synth.page_for_url(cu, self.universe, with_payload=False)
            text = (snippet["title"] + "\n" + snippet["description"]).lower()
            admitted = uh not in self.blacklist and any(t in text for t in self.terms)
            if admitted:
                n_admitted += 1
                host = kernels.host_of(cu)
                self.frontier[uh] = {
                    "url": cu,
                    "url_hash": uh,
                    "host": host,
                    "host_hash": kernels.url_hash64(host),
                    "priority": PRIORITY_DISCOVERY,
                    "next_fetch_epoch": as_of,
                    "last_fetch_epoch": None,
                    "source": "discovery",
                    "ignore_filter_terms": False,
                    "depth": cand[cu],
                }
                self.seen[uh] = "accepted"
            else:
                n_rejected += 1
                self.seen[uh] = "rejected"

        # robots refetch (mirrors scheduler step 1b): popped hosts whose
        # cached robots row is older than the TTL re-read robots.txt at
        # the current synth content version; applied AFTER this batch's
        # pop/admission used the stale cache (the engine's refreshed rows
        # commit with the batch and bind on the NEXT pop)
        if self.robots_ttl_secs > 0:
            ver = synth.robots_version_at(
                as_of, self.t0_epoch, self.robots_change_period_secs
            )
            for hh in {r["host_hash"] for r in popped}:
                if as_of - self.robots_fetched.get(hh, 0) < self.robots_ttl_secs:
                    continue
                host = self._host_by_hash[hh]
                d = synth.robots_directives_for_host(host, ver)
                self.crawl_delay.pop(hh, None)
                self.sitemaps.pop(hh, None)
                if d["crawl_delay_ms"]:
                    self.crawl_delay[hh] = d["crawl_delay_ms"]
                if d["sitemap_urls"]:
                    self.sitemaps[hh] = d["sitemap_urls"]
                self.robots_fetched[hh] = as_of
                self.robots_version[hh] = ver

        # rank refresh on the maintenance cadence (mirrors
        # host_rank_upkeep: ranks derive from the edges folded THROUGH
        # this batch and bind from the next pop)
        if (self.rank_pop_boost and self.maintenance_every
                and (self.batch_id + 1) % self.maintenance_every == 0):
            ranks = pagerank_py(self.decayed_or_plain_edges())
            kk = max(1, len(ranks) // 10)
            order = sorted(ranks.items(), key=lambda kv: (-kv[1], kv[0]))
            self._boosted = {h for h, _ in order[:kk]}

        self.batch_id += 1
        return {
            "batch_id": self.batch_id - 1,
            "popped": len(popped),
            "fetched_ok": n_ok,
            "errors": n_err,
            "admitted": n_admitted,
            "rejected": n_rejected,
        }

    def run(self, n_batches: int) -> list[dict]:
        return [self.run_batch() for _ in range(n_batches)]
