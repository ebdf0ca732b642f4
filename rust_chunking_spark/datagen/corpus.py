"""Deterministic synthetic Common-Crawl-style corpus + WAL of change events.

Schema follows BASELINE.json input_hint:
  pages:  url string, warc_ts timestamp, html binary, text string, lang string
  events: + op string (I/U/D), lsn long, epoch long  (and, from the
          schema-evolution epoch onward, fetch_status int — additive column)

Everything is a pure function of (seed, ids): page text/html for (page_id,
version) is reproducible on any worker, so generation can run distributed
(spark.range -> mapInPandas) without coordination, and the plain-Python
`expected_final_state` can serve as the replay oracle in tests.

The WAL is adversarial on purpose: no-op updates (same content re-crawled),
exact duplicate events, late arrivals (older warc_ts delivered after newer),
deletes, and hot Zipfian domains for skew.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import numpy as np

EPOCH0 = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

_WORDS = (
    "the quick brown fox jumps over lazy dog web page content crawl data "
    "lake spark merge chunk hash index stream table query filter join scan "
    "commit snapshot epoch event update insert delete schema column row "
    "partition shuffle skew salt bucket domain url text html lang crawl"
).split()

N_DOMAINS = 256
ZIPF_EXP = 1.1
# schema evolution: events gain fetch_status from this fraction of epochs onward
EVOLUTION_FRACTION = 0.5


def _rng(*key: int) -> np.random.Generator:
    return np.random.default_rng(np.array(key, dtype=np.uint64))


def domain_for(page_id: int, seed: int) -> str:
    # Zipfian domain: low ids are hot
    r = _rng(seed, 0xD0, page_id)
    u = r.random()
    # inverse-CDF sample over N_DOMAINS ranks with exponent ZIPF_EXP
    ranks = np.arange(1, N_DOMAINS + 1, dtype=np.float64) ** (-ZIPF_EXP)
    cdf = np.cumsum(ranks) / ranks.sum()
    d = int(np.searchsorted(cdf, u))
    return f"site{d:04d}.example.com"


def page_text(page_id: int, version: int, seed: int) -> str:
    r = _rng(seed, 0x7E, page_id, version)
    n_words = int(r.integers(80, 2500))
    idx = r.integers(0, len(_WORDS), n_words)
    words = [_WORDS[i] for i in idx]
    # sprinkle sentence structure for realistic text stats
    for j in range(0, n_words, 12):
        words[j] = words[j].capitalize()
    return " ".join(words)


def make_html(url: str, text: str, lang: str) -> bytes:
    """Deterministic page wrapper; extract_text() inverts it byte-exactly."""
    head = (f'<html lang="{lang}"><head><title>{url}</title>'
            f'<meta charset="utf-8"/></head><body><main id="content">')
    tail = "</main><footer>crawl-sim</footer></body></html>"
    return (head + text + tail).encode("utf-8")


def extract_text(html: bytes) -> str:
    """Inverse of make_html — byte-identical text per url (input_hint invariant)."""
    s = html.decode("utf-8")
    a = s.index('<main id="content">') + len('<main id="content">')
    b = s.index("</main>", a)
    return s[a:b]


def lang_for(page_id: int, seed: int) -> str:
    langs = ["en", "en", "en", "de", "fr", "es", "zh", "ru"]
    return langs[int(_rng(seed, 0x1A, page_id).integers(0, len(langs)))]


def url_for(page_id: int, seed: int) -> str:
    return f"https://{domain_for(page_id, seed)}/page/{page_id}"


def page_record(page_id: int, version: int, ts_minutes: int, seed: int) -> dict:
    url = url_for(page_id, seed)
    lang = lang_for(page_id, seed)
    text = page_text(page_id, version, seed)
    return {
        "url": url,
        "warc_ts": EPOCH0 + dt.timedelta(minutes=int(ts_minutes)),
        "html": make_html(url, text, lang),
        "text": text,
        "lang": lang,
    }


def generate_wal(n_pages: int, n_epochs: int, events_per_epoch: int,
                 seed: int = 42) -> list[list[dict]]:
    """WAL as a list of epochs, each a list of event dicts (driver-side scale).

    Event mix per epoch: ~55% updates (of which ~25% are no-op re-crawls and
    ~10% late arrivals), ~35% inserts, ~10% deletes, plus ~5% exact duplicates
    appended. lsn is globally increasing except for duplicated events (same
    lsn re-delivered). From EVOLUTION_FRACTION of epochs onward, events carry
    the additive column fetch_status.
    """
    epochs: list[list[dict]] = []
    lsn = 0
    live: dict[int, tuple[int, int]] = {}   # page_id -> (version, ts_minutes)
    next_page = 0
    evo_epoch = math.ceil(n_epochs * EVOLUTION_FRACTION)
    for ep in range(n_epochs):
        r = _rng(seed, 0xE0, ep)
        events: list[dict] = []

        def emit(page_id, version, ts_minutes, op, this_lsn, r=r, ep=ep):
            rec = page_record(page_id, version, ts_minutes, seed)
            ev = {**rec, "op": op, "lsn": this_lsn, "epoch": ep}
            if op == "D":
                ev["html"] = None
                ev["text"] = None
            if ep >= evo_epoch:
                ev["fetch_status"] = int(200 if r.random() > 0.05 else 304)
            events.append(ev)

        for _ in range(events_per_epoch):
            lsn += 1
            ts = ep * 1000 + int(r.integers(0, 1000))
            roll = r.random()
            if roll < 0.35 or not live:
                pid = next_page
                next_page += 1
                live[pid] = (0, ts)
                emit(pid, 0, ts, "I", lsn)
            elif roll < 0.90:
                pid = int(r.choice(list(live.keys())))
                ver, old_ts = live[pid]
                sub = r.random()
                if sub < 0.25:
                    # no-op re-crawl: same content, newer ts
                    nts = max(old_ts + 1, ts)
                    live[pid] = (ver, nts)
                    emit(pid, ver, nts, "U", lsn)
                elif sub < 0.35:
                    # late arrival: stale version with older ts
                    emit(pid, max(0, ver - 1), max(0, old_ts - 500), "U", lsn)
                else:
                    nts = max(old_ts + 1, ts)
                    live[pid] = (ver + 1, nts)
                    emit(pid, ver + 1, nts, "U", lsn)
            else:
                pid = int(r.choice(list(live.keys())))
                ver, old_ts = live[pid]
                nts = max(old_ts + 1, ts)
                del live[pid]
                emit(pid, ver, nts, "D", lsn)
        # exact duplicates: re-deliver ~5% of this epoch's events (same lsn)
        n_dup = max(1, len(events) // 20)
        dup_idx = r.integers(0, len(events), n_dup)
        for i in dup_idx:
            events.append(dict(events[int(i)]))
        epochs.append(events)
    return epochs


def expected_final_state(epochs: list[list[dict]]) -> dict[str, dict]:
    """Plain-Python replay oracle: LWW by (warc_ts, lsn), deletes win likewise."""
    state: dict[str, dict] = {}
    tomb: dict[str, tuple] = {}
    for events in epochs:
        for ev in events:
            key = (ev["warc_ts"], ev["lsn"])
            url = ev["url"]
            cur = state.get(url)
            cur_key = (cur["warc_ts"], cur["lsn"]) if cur else tomb.get(url)
            if cur_key is not None and key <= cur_key:
                continue
            if ev["op"] == "D":
                state.pop(url, None)
                tomb[url] = key
            else:
                tomb.pop(url, None)
                state[url] = ev
    return state


def wal_to_rows(epochs: list[list[dict]]):
    for events in epochs:
        yield from events


def generate_pages_df(spark, n_pages: int, seed: int = 42):
    """Distributed deterministic page corpus (version 0) as a DataFrame."""
    from pyspark.sql.types import (BinaryType, StringType, StructField,
                                   StructType, TimestampType)

    schema = StructType([
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), False),
        StructField("lang", StringType(), False),
    ])

    def gen(iterator):
        import pandas as pd
        for pdf in iterator:
            rows = [page_record(int(i), 0, int(i) % 1000, seed)
                    for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], utc=True).dt.tz_localize(None)
            yield out

    return spark.range(n_pages).mapInPandas(gen, schema)


def fingerprint_of(html: bytes) -> bytes:
    """Page-level content fingerprint (sha3-256 of html) for oracle checks."""
    return hashlib.sha3_256(html).digest()
