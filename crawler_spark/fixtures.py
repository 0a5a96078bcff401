"""Deterministic synthetic crawl corpus generator (SURVEY.md §5, FIXTURES.md).

Generates the `pages` table (authoritative shape from BASELINE.json
input_hint: url, warc_ts, html binary, text, lang) plus `seeds` and
`robots`, at parameterized scale, seed=42, with every edge case the
reference's parser exercises:

- 2-level category trees, null imgs, IsSuccess:false category page
  (quarantine, ShiweijiaCategory.cs:67-71),
- listing pagination with Total divisible / not divisible by 50, an empty
  listing, a failing listing page mid-pagination (ShiweijiaProduct.cs:105-127),
- detail pages with duplicate spec keys (exception-truncation,
  ShiweijiaProduct.cs:285-294), missing optional fields, null img arrays,
  variant rings of 1..5 ids including self, shared brands, CJK strings,
  duplicate feature-group names (GetFeatures truncation), a failing variant
  inside a ring, the Thumbnails→MainImgs-json fallback (ShiweijiaProduct.cs:319),
- Zipf-skewed per-host page counts with one mega-host (skew/salting), a
  0-delay and a huge-delay robots host, disallowed path prefixes.

The `text` column is stamped by the pure-Python oracle
(`oracle.render_detail_text`) — the engine's vectorized extraction must
reproduce it byte-identically.

Generation is keyed by stable per-entity hashes (not a sequential RNG), so
it is order-independent and chunk-parallelizable at bench scale.
"""

from __future__ import annotations

import json
import os
import zlib
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from . import oracle

_BASE_TS = datetime(2026, 1, 1, tzinfo=timezone.utc)

_TLDS = ["com", "co.uk", "com.cn", "net", "org"]
_CJK_NAMES = ["现代简约沙发", "北欧实木床", "轻奢餐桌", "智能升降书桌", "布艺电视柜"]
_SPEC_NAMES = ["材质", "风格", "产地", "颜色分类", "尺寸"]
_SPEC_VALUES = ["实木", "现代", "佛山", "胡桃色", "1.8米"]
_FEATURE_GROUPS = ["颜色", "规格"]
_FEATURE_VALUES = {"颜色": ["白色", "灰色", "原木色"], "规格": ["标准版", "加大版"]}
_BRAND_NAMES = ["林氏木业", "全友家居", "顾家家居", "芝华仕", "源氏木语", "双虎", "曲美"]

_HUGE_DELAY_MS = 1_000_000


def _h(*parts) -> int:
    """Stable 32-bit hash of the given key parts (seed derivation)."""
    return zlib.crc32("|".join(str(p) for p in parts).encode("utf-8"))


@dataclass
class CorpusSpec:
    n_hosts: int = 4
    n_products: int = 400  # total detail pages across hosts (pre-skew)
    zipf_s: float = 1.1
    leaves_per_host: int = 4
    seed: int = 42

    @property
    def name(self) -> str:
        return f"h{self.n_hosts}-p{self.n_products}-s{self.seed}-v3"


SMOKE = CorpusSpec(n_hosts=4, n_products=400)
CORRECTNESS = CorpusSpec(n_hosts=8, n_products=4000, leaves_per_host=6)


def bench_spec(n_products: int = 200_000, n_hosts: int = 64) -> CorpusSpec:
    return CorpusSpec(n_hosts=n_hosts, n_products=n_products, leaves_per_host=8)


def host_name(i: int) -> str:
    return f"shop{i}.example{i % 7}.{_TLDS[i % len(_TLDS)]}"


def _zipf_weights(n: int, s: float) -> list[float]:
    w = [1.0 / (i + 1) ** s for i in range(n)]
    tot = sum(w)
    return [x / tot for x in w]


def _img_link(site: str, key: str, i: int) -> str:
    return f"https://img.{site}/p/{key}/pic-{i}.jpg"


# ---------------------------------------------------------------------------
# Per-host structure
# ---------------------------------------------------------------------------


@dataclass
class HostPlan:
    idx: int
    site: str  # full hostname
    host: str  # registrable domain
    crawl_delay_ms: int
    n_products: int
    category_fails: bool
    leaves: list[int]  # leaf category ids
    roots: list[int]


def _delay_for(idx: int, n_hosts: int) -> int:
    if idx == 0:
        return 0  # mega host: k = max_k (skew path)
    if n_hosts >= 4 and idx == n_hosts - 2:
        return _HUGE_DELAY_MS  # k = 1 per superstep (kept tiny below)
    return [3000, 1000, 6000, 2000][idx % 4]


def plan_hosts(spec: CorpusSpec, registrable_domain) -> list[HostPlan]:
    weights = _zipf_weights(spec.n_hosts, spec.zipf_s)
    plans = []
    for i in range(spec.n_hosts):
        site = host_name(i)
        delay = _delay_for(i, spec.n_hosts)
        n_prod = max(4, int(round(weights[i] * spec.n_products)))
        if delay == _HUGE_DELAY_MS:
            n_prod = 4  # huge-delay host stays tiny (bounds superstep count)
        # pagination chains are sequential by reference semantics (one
        # next-page per superstep); bound chain length at bench scale by
        # giving large hosts enough leaves (~≤6 pages per leaf listing)
        base = spec.leaves_per_host if i == 0 else max(
            2, spec.leaves_per_host // 2
        )
        n_leaves = max(base, -(-n_prod // 250))
        base = (i + 1) * 1_000_000
        plans.append(
            HostPlan(
                idx=i,
                site=site,
                host=registrable_domain(site),
                crawl_delay_ms=delay,
                n_products=n_prod,
                category_fails=(spec.n_hosts >= 4 and i == spec.n_hosts - 1),
                leaves=[base + 100 + j for j in range(n_leaves)],
                roots=[base, base + 1],
            )
        )
    return plans


def _category_body(hp: HostPlan) -> dict:
    if hp.category_fails:
        return {"IsSuccess": False, "Message": "签名验证失败", "Data": []}
    n_roots = len(hp.roots)
    data = []
    for r, root in enumerate(hp.roots):
        subs = hp.leaves[r::n_roots]
        data.append(
            {
                "ID": root,
                "CategoryName": f"分类{r}号",
                "CategoryImg": None
                if r % 2 == 0
                else _img_link(hp.site, f"cat{root}", 0),
                "Subs": [
                    {
                        "ID": leaf,
                        "CategoryName": f"子类{leaf % 1000}",
                        "CategoryImg": _img_link(hp.site, f"cat{leaf}", 0)
                        if leaf % 3
                        else None,
                        "Subs": [],
                    }
                    for leaf in subs
                ],
            }
        )
    return {"IsSuccess": True, "Message": "", "Data": data}


def _leaf_products(hp: HostPlan) -> dict[int, list[list[int]]]:
    """Variant groups per leaf: leaf id -> list of groups (lists of pids).

    The mega host's first leaf uses singleton groups so its listing
    paginates (>50 leaders); its second leaf gets exactly 50 leaders
    (Total divisible by PageSize boundary); the last leaf of every host is
    empty (empty-Rows edge). Product ids are globally unique.
    """
    out: dict[int, list[list[int]]] = {}
    base = (hp.idx + 1) * 10_000_000
    n = hp.n_products
    n_leaves = len(hp.leaves)
    counts = [0] * n_leaves
    if hp.idx == 0 and n >= 160:
        # ≥3 listing pages of singletons, capped so the sequential
        # next-page chain stays short even at bench scale
        counts[0] = max(110, min(int(n * 0.55), 300))
        counts[1] = 50  # exactly-one-page boundary
        rest = n - counts[0] - counts[1]
        for j in range(2, n_leaves - 1):
            counts[j] = rest // max(1, n_leaves - 3)
    else:
        for j in range(n_leaves - 1):
            counts[j] = n // max(1, n_leaves - 1)
    counts[0] += n - sum(counts)
    pid = 0
    for li, (leaf, cnt) in enumerate(zip(hp.leaves, counts)):
        groups: list[list[int]] = []
        made = 0
        g = 0
        singleton = hp.idx == 0 and li in (0, 1) and n >= 160
        while made < cnt:
            size = 1 if singleton else min((g % 5) + 1, cnt - made)
            groups.append([base + pid + k for k in range(size)])
            pid += size
            made += size
            g += 1
        out[leaf] = groups
    return out


def _listing_bodies(hp: HostPlan, leaf: int, groups: list[list[int]]) -> list[dict]:
    """Paginated listing bodies in page order (1-based). Rows contain only
    group leaders — variants are discovered via detail pages (§3.3)."""
    leaders = [g[0] for g in groups]
    total = len(leaders)
    page_size = 50
    n_pages = max(1, -(-total // page_size))
    bodies = []
    for k in range(1, n_pages + 1):
        if hp.idx == 0 and leaf == hp.leaves[0] and k == n_pages and n_pages > 2:
            # failing listing page mid-pagination (quarantine; stops the
            # page chain, last page's products stay undiscovered)
            bodies.append({"IsSuccess": False, "Message": "限流", "Data": None})
            continue
        rows = [{"ID": p} for p in leaders[(k - 1) * page_size : k * page_size]]
        bodies.append(
            {"IsSuccess": True, "Data": {"Rows": rows, "PageIndex": k, "Total": total}}
        )
    return bodies


def _detail_body(hp: HostPlan, pid: int, group: list[int]) -> dict:
    h = _h(hp.site, pid)
    # a late variant id in some rings fails (IsSuccess false) — exercises
    # quarantine inside a ring without killing the ring
    if len(group) >= 4 and pid == group[-1] and h % 3 == 0:
        return {"IsSuccess": False, "Message": "商品不存在", "Data": None}
    brand_i = h % len(_BRAND_NAMES)
    brand_id = (hp.idx + 1) * 1000 + brand_i
    sale = round((h % 9000) / 10 + 99.0, 2)
    d: dict = {
        "ID": pid,
        "BrandId": brand_id,
        "Brand": _BRAND_NAMES[brand_i],
        "BrandImg": _img_link(hp.site, f"brand{brand_id}", 0),
        "ProductCode": f"PC{pid}",
        "SalePrice": sale,
    }
    if h % 13 != 0:
        d["Name"] = f"{_CJK_NAMES[h % len(_CJK_NAMES)]}-{pid % 97}"
    if h % 5 != 0:
        d["Pattern"] = ["现代", "北欧", "轻奢"][h % 3]
    # img arrays: null / missing / populated
    if h % 11 == 0:
        d["MainImgs"] = None
    elif h % 11 != 1:
        d["MainImgs"] = [_img_link(hp.site, f"p{pid}", i) for i in range(1 + h % 3)]
    if h % 7 == 0:
        d["DetailImgs"] = None
    elif h % 7 != 1:
        d["DetailImgs"] = [_img_link(hp.site, f"p{pid}d", i) for i in range(1 + h % 4)]
    # Paras: missing every ~11th; duplicate key every ~7th (truncation parity)
    if h % 11 != 2:
        paras = []
        used = 0
        for gidx in range(1 + h % 2):
            group_paras = []
            for j in range(1 + (h >> gidx) % 3):
                val = _SPEC_VALUES[(h + j) % len(_SPEC_VALUES)]
                if j == 1 and h % 4 == 0:
                    val = ""  # empty value skipped (P4)
                group_paras.append(
                    {
                        "Name": _SPEC_NAMES[(used + j) % len(_SPEC_NAMES)],
                        "ParameterValue": val,
                    }
                )
            used += len(group_paras)
            paras.append({"Paras": group_paras})
        if h % 7 == 3 and paras[0]["Paras"]:
            paras[-1]["Paras"].append(dict(paras[0]["Paras"][0]))
            paras[-1]["Paras"].append({"Name": "恒不可达", "ParameterValue": "截断后"})
        d["Paras"] = paras
    # Specification + ProductSpecifications (variant ring)
    vid_base = pid * 100
    spec_groups = [
        {
            "Name": gname,
            "Values": [
                {"Id": vid_base + gi * 10 + vi, "Name": v}
                for vi, v in enumerate(_FEATURE_VALUES[gname])
            ],
        }
        for gi, gname in enumerate(_FEATURE_GROUPS)
    ]
    if h % 17 == 0:
        # duplicate feature-group name → GetFeatures truncation
        spec_groups.append(
            {"Name": _FEATURE_GROUPS[0], "Values": [{"Id": vid_base + 90, "Name": "重复"}]}
        )
    d["Specification"] = spec_groups
    ps = []
    for vpos, vpid in enumerate(group):
        item = {
            "ProductId": vpid,
            "SpecificationValueIds": [
                vid_base + (vpos % len(_FEATURE_VALUES["颜色"])),
                vid_base + 10 + (vpos % len(_FEATURE_VALUES["规格"])),
            ],
            "Price1": round(sale * 0.8, 2),
            "Price2": round(sale * 0.9, 2),
            "Thumbnails": _img_link(hp.site, f"p{vpid}t", 0),
        }
        if h % 6 == 0:
            item.pop("Thumbnails")  # → MainImgs-json fallback (cs:319)
        ps.append(item)
    d["ProductSpecifications"] = ps
    return {"IsSuccess": True, "Data": d}


# ---------------------------------------------------------------------------
# Corpus assembly
# ---------------------------------------------------------------------------


@dataclass
class Corpus:
    pages: dict[str, bytes]  # url -> html bytes
    text: dict[str, str]  # url -> ground-truth text
    lang: dict[str, str]
    seeds: list[dict]
    robots: dict[str, dict]
    plans: list[HostPlan]


def build_corpus(spec: CorpusSpec, registrable_domain) -> Corpus:
    plans = plan_hosts(spec, registrable_domain)
    pages: dict[str, bytes] = {}
    text: dict[str, str] = {}
    lang: dict[str, str] = {}
    seeds: list[dict] = []
    robots: dict[str, dict] = {}

    for hp in plans:
        lg = "zh" if hp.idx % 3 != 1 else "en"
        robots[hp.host] = {
            "crawl_delay_ms": hp.crawl_delay_ms,
            "disallow_prefixes": ["/api/admin"],
        }
        seeds.append({"url": oracle.category_url(hp.site), "seed_order": hp.idx})
        seeds.append(
            {
                "url": f"https://{hp.site}/api/admin/secret",
                "seed_order": spec.n_hosts + hp.idx,
            }
        )

        def put(url: str, body: dict, txt: str = "") -> None:
            pages[url] = json.dumps(
                body, ensure_ascii=False, separators=(",", ":")
            ).encode("utf-8")
            text[url] = txt
            lang[url] = lg

        put(oracle.category_url(hp.site), _category_body(hp))
        if hp.category_fails:
            continue
        for leaf, groups in _leaf_products(hp).items():
            for k, body in enumerate(_listing_bodies(hp, leaf, groups), start=1):
                put(oracle.listing_url(hp.site, leaf, k), body)
            for group in groups:
                for pid in group:
                    body = _detail_body(hp, pid, group)
                    txt = (
                        oracle.render_detail_text(body["Data"])
                        if body["IsSuccess"]
                        else ""
                    )
                    put(oracle.detail_url(hp.site, pid, leaf), body, txt)
    return Corpus(
        pages=pages, text=text, lang=lang, seeds=seeds, robots=robots, plans=plans
    )


def warc_ts(url: str) -> datetime:
    return _BASE_TS + timedelta(seconds=_h("ts", url) % 2_592_000)


def write_corpus(corpus: Corpus, outdir: str, chunk: int = 8_192) -> dict:
    """Write pages/seeds/robots parquet (pyarrow, chunked for bench scale)."""
    os.makedirs(outdir, exist_ok=True)
    urls = sorted(corpus.pages)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    with pq.ParquetWriter(os.path.join(outdir, "pages.parquet"), schema) as w:
        for i in range(0, len(urls), chunk):
            part = urls[i : i + chunk]
            w.write_table(
                pa.table(
                    {
                        "url": part,
                        "warc_ts": [warc_ts(u) for u in part],
                        "html": [corpus.pages[u] for u in part],
                        "text": [corpus.text[u] for u in part],
                        "lang": [corpus.lang[u] for u in part],
                    },
                    schema=schema,
                )
            )
    pq.write_table(
        pa.table(
            {
                "url": [s["url"] for s in corpus.seeds],
                "priority_ts": [_BASE_TS for _ in corpus.seeds],
                "seed_order": [s["seed_order"] for s in corpus.seeds],
            },
            schema=pa.schema(
                [
                    ("url", pa.string()),
                    ("priority_ts", pa.timestamp("us", tz="UTC")),
                    ("seed_order", pa.int64()),
                ]
            ),
        ),
        os.path.join(outdir, "seeds.parquet"),
    )
    hosts = sorted(corpus.robots)
    pq.write_table(
        pa.table(
            {
                "host": hosts,
                "crawl_delay_ms": [corpus.robots[h]["crawl_delay_ms"] for h in hosts],
                "disallow_prefixes": [
                    corpus.robots[h]["disallow_prefixes"] for h in hosts
                ],
            },
            schema=pa.schema(
                [
                    ("host", pa.string()),
                    ("crawl_delay_ms", pa.int64()),
                    ("disallow_prefixes", pa.list_(pa.string())),
                ]
            ),
        ),
        os.path.join(outdir, "robots.parquet"),
    )
    meta = {"n_pages": len(urls), "n_seeds": len(corpus.seeds), "n_hosts": len(hosts)}
    with open(os.path.join(outdir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def ensure_corpus(spec: CorpusSpec, root: str, registrable_domain) -> str:
    """Generate-once cache: fixtures live under <root>/<spec.name>/."""
    outdir = os.path.join(root, spec.name)
    if os.path.exists(os.path.join(outdir, "meta.json")):
        return outdir
    corpus = build_corpus(spec, registrable_domain)
    write_corpus(corpus, outdir)
    return outdir
