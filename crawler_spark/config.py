"""Engine configuration (ref: Figment JSON + env merge, src/main.rs:49-52,
and the per-producer enable flags of src/models/config.rs:4-9).

Precedence: defaults < JSON file < environment (CRAWLER_SPARK_* vars) —
the same layering the reference gets from Figment. The three reference
producers map onto two engine switches:

  enable_discovery — admit outlink candidates (ChannelDiscoveryCrawler,
                     gated at src/main.rs:157)
  enable_recrawl   — re-pop already-fetched rows when their staleness
                     window expires (ChannelUpdateCrawler + NewVideoCrawler,
                     gates src/main.rs:206,231)

Seeds (AdditionalChannelCrawler, src/main.rs:132) are the store bootstrap
and always load.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, fields


@dataclass
class CrawlConfig:
    universe: int = 10_000
    n_seeds: int = 32
    k_per_host: int = 8
    # scale each host's pop cap with the decade of its ready-queue depth
    # (cap = k_per_host * digits(depth), still politeness-bounded) — the
    # host_depth_histogram signal fed back into the pop
    adaptive_pop_caps: bool = False
    tick_secs: int = 6 * 3600
    t0_epoch: int = 1_700_000_000
    n_shards: int = 16
    use_sketch: bool = True
    sketch_probe: str = "broadcast"  # or "partitioned" (10^10-key path)
    lineage_hashes: bool = True
    quota_boost: int = 1
    collect_stats: bool = True
    enable_discovery: bool = True
    enable_recrawl: bool = True
    # per-producer cadences in seconds (0 = every batch) — the reference
    # runs discovery daily behind a watermark and recrawl every 900 s
    # (channel_discovery_crawler.rs:109-118, channel_update_crawler.rs:12)
    discovery_interval_secs: int = 0
    recrawl_interval_secs: int = 0
    # robots refetch staleness: popped hosts re-read robots.txt when the
    # cached row is older than the TTL (0 = cache forever, the
    # reference's process-lifetime behavior, src/main.rs:162-164); the
    # synth web rewrites robots content every change-period seconds
    robots_ttl_secs: int = 0
    robots_change_period_secs: int = 0
    # fold each batch's outlink host edges into the persisted host_edges
    # table and recompute host_ranks (PageRank) at maintenance ticks
    maintain_host_graph: bool = False
    # seen rows are new-by-construction: land them as per-shard delta
    # files (invlist append) instead of rewriting dirty shards
    seen_append: bool = True
    # discovered frontier rows are insert-only by construction
    # (filter_unseen guarantees novelty): land them as bucket delta
    # files; popped-row UPDATES still CoW-merge, and a bucket receiving
    # both routes through the merge (the overlap guard)
    frontier_append: bool = True
    # top-decile host_ranks hosts get a doubled pop cap (requires
    # maintain_host_graph + maintenance_every; binds after the first
    # maintenance tick commits ranks)
    rank_pop_boost: bool = False
    # windowed/decayed host authority: edge folds are epoch-tagged and
    # ranks derive from sum(w_e * 0.5^(E-e)) truncated at the window —
    # stale boilerplate links fade instead of accumulating forever
    # (requires maintain_host_graph + maintenance_every)
    host_rank_decay: bool = False
    host_rank_decay_window: int = 16
    maintenance_every: int = 0  # 0 = off; else compact+gc every N batches
    # maintain the similarity-index sidecar (<root>/vindex) in the same
    # maintenance tick as corpus dedup
    maintain_vindex: bool = True
    # also maintain the residual-PQ codes sidecar (pq_model trained ONCE
    # at bootstrap, frozen; new vectors encoded per tick). Off by
    # default: the bootstrap pays an in-engine k-means training pass
    maintain_pq: bool = False
    # also maintain the DSIR data-selection sidecar (tokenize-once feats
    # table + folded count distributions; operators/dsir.py)
    maintain_dsir: bool = False

    @classmethod
    def load(cls, json_path: str | None = None, env: dict | None = None) -> "CrawlConfig":
        vals: dict = {}
        if json_path:
            with open(json_path) as f:
                data = json.load(f)
            unknown = set(data) - {f.name for f in fields(cls)}
            if unknown:
                raise KeyError(f"unknown config keys: {sorted(unknown)}")
            vals.update(data)
        env = os.environ if env is None else env
        for f in fields(cls):
            key = f"CRAWLER_SPARK_{f.name.upper()}"
            if key in env:
                raw = env[key]
                if f.type == "bool":
                    vals[f.name] = raw.lower() in ("1", "true", "yes")
                elif f.type == "str":
                    vals[f.name] = raw
                else:
                    vals[f.name] = int(raw)
        return cls(**vals)

    def scheduler_kwargs(self) -> dict:
        return {f.name: getattr(self, f.name) for f in fields(self)}
