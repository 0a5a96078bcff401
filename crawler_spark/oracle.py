"""Pure-Python oracle: faithful reimplementation of the reference crawler's
parse/render/crawl semantics (SURVEY.md §5-2).

This module is the *ground truth*. It is deliberately row-at-a-time plain
Python with no Spark imports: `crawler_spark.fixtures` uses it to stamp the
`text` column of the synthetic corpus, and the golden end-to-end tests
compare the Spark engine's output (crawl order, url_seen set, extracted
text, entity tables) against `simulate_crawl` here. The Spark engine
(`crawler_spark.extract` / `crawler_spark.engine`) is an independent
vectorized implementation — equality between the two is a real check.

Reference semantics reproduced (citations into /root/reference/):
- spec-dict build with exception-truncation on duplicate keys
  (HZ.Crawler.DataSpider/Shiweijia/ShiweijiaProduct.cs:271-296),
- feature id→name decode, first-group-wins, duplicate-feature-name skip
  (ShiweijiaProduct.cs:298-361),
- Newtonsoft insertion-order compact dict/list serialization
  (ShiweijiaProduct.cs:295,320,409,455),
- System.Text.Json array serialization with UnicodeRanges.All — raw CJK,
  HTML-sensitive ASCII escaped as \\uXXXX (ShiweijiaProduct.cs:366-385),
- detail-text rendering `<p>{k}:{v}</p>` + `<img src="{u}" />`
  (ShiweijiaProduct.cs:435-461),
- image upload dedup keyed by md5 of the base64 data-URI
  (HZ.Crawler.DataSpider/BaseSpider.cs:267-316), extension extraction with
  `-suffix` strip (BaseSpider.cs:230-234),
- variant-closure DFS: first id in the latest variant list not yet fetched
  (ShiweijiaProduct.cs:158-187) — with consistent variant rings this equals
  list-order expansion, which is what the frontier model does,
- seed order: categories by UpdateDate (== discovery pre-order) where
  ParentId != null (ShiweijiaProduct.cs:48-51),
- listing pagination: next page while pageIndex < ceil(total/50)
  (ShiweijiaProduct.cs:105-127),
- insert-if-absent categories (ShiweijiaCategory.cs:83-107).

The reference's wall-clock politeness (ThreadCount=5, 3-6 s sleeps,
BaseSpider.cs:97-139) is mapped to the deterministic superstep contract
described in SURVEY.md §7.3-2: per registrable host, per superstep, at most
``k(host) = max(1, budget_ms // crawl_delay_ms)`` URLs are fetched, in
priority order ``(path, url)`` where ``path`` is the lexicographic
discovery path (seed order / page index / row position / variant position).
Cross-host interleaving is defined by superstep barriers.
"""

from __future__ import annotations

import base64
import hashlib
import json
from dataclasses import dataclass, field
from urllib.parse import parse_qs, urlsplit

# ---------------------------------------------------------------------------
# Serialization parity helpers
# ---------------------------------------------------------------------------

# JavaScriptEncoder.Create(UnicodeRanges.All) keeps all non-ASCII raw but
# still escapes HTML-sensitive ASCII. Minimal faithful set for our corpus.
_STJ_ESCAPES = {
    "<": "\\u003C",
    ">": "\\u003E",
    "&": "\\u0026",
    "'": "\\u0027",
    "+": "\\u002B",
    '"': '\\"',
    "\\": "\\\\",
}


def _stj_escape(s: str) -> str:
    return "".join(_STJ_ESCAPES.get(c, c) for c in s)


def stj_string_list(items: list[str]) -> str:
    """System.Text.Json serialization of List<string> (ArrayToJson,
    ShiweijiaProduct.cs:366-385). The reference emits [] for null/absent."""
    return "[" + ",".join('"' + _stj_escape(i) + '"' for i in items) + "]"


def _newtonsoft_str(s: str) -> str:
    # Newtonsoft default: escape quotes/backslash/control, keep CJK raw.
    out = []
    for c in s:
        if c == '"':
            out.append('\\"')
        elif c == "\\":
            out.append("\\\\")
        elif c == "\n":
            out.append("\\n")
        elif c == "\r":
            out.append("\\r")
        elif c == "\t":
            out.append("\\t")
        elif ord(c) < 0x20:
            out.append(f"\\u{ord(c):04x}")
        else:
            out.append(c)
    return "".join(out)


def newtonsoft_dict(d: dict[str, str]) -> str:
    """Newtonsoft JsonConvert.SerializeObject(Dictionary<string,string>):
    compact, insertion order preserved."""
    return (
        "{"
        + ",".join(
            f'"{_newtonsoft_str(k)}":"{_newtonsoft_str(v)}"' for k, v in d.items()
        )
        + "}"
    )


def newtonsoft_str_list(items: list[str]) -> str:
    """Newtonsoft JsonConvert.SerializeObject(List<string>) — compact."""
    return "[" + ",".join('"' + _newtonsoft_str(i) + '"' for i in items) + "]"


def newtonsoft_attr_list(pairs: list[tuple[str, str]]) -> str:
    """Serialization of the anonymous {AttributeName, AttributeValue}
    projection (ShiweijiaProduct.cs:482-487)."""
    return (
        "["
        + ",".join(
            '{"AttributeName":"%s","AttributeValue":"%s"}'
            % (_newtonsoft_str(k), _newtonsoft_str(v))
            for k, v in pairs
        )
        + "]"
    )


def decimal_str(x) -> str:
    """C# decimal.ToString() for values parsed from 2-dp JSON literals."""
    return f"{x:.2f}"


# ---------------------------------------------------------------------------
# Image upload model (sandbox-deterministic stand-in for the upload API)
# ---------------------------------------------------------------------------


def ext_of(link: str) -> str:
    """Extension extraction per UploadImgsByLink (BaseSpider.cs:230-234):
    substring after last '.', with a trailing '-suffix' stripped."""
    ext = link[link.rfind(".") + 1 :]
    if "-" in ext:
        ext = ext[: ext.rfind("-")]
    return ext


def img_md5_key(link: str) -> str:
    """MD5 key of the base64 data-URI the reference uploads
    (BaseSpider.cs:239,275). Image bytes are modeled deterministically as
    md5(link).digest() — no network in the sandbox."""
    content = hashlib.md5(link.encode("utf-8")).digest()
    data_uri = f"data:image/{ext_of(link)};base64," + base64.b64encode(content).decode(
        "ascii"
    )
    return hashlib.md5(data_uri.encode("utf-8")).hexdigest()


def upload_url(link: str) -> str:
    """Deterministic uploaded URL for an image link (stands in for the
    Message[] URLs returned by the upload API, BaseSpider.cs:298-315)."""
    return f"https://img.cdn.test/{img_md5_key(link)}.{ext_of(link)}"


# ---------------------------------------------------------------------------
# Detail-page parsing (ParseProduct + GetSpecifications + GetFeatures +
# GetAllProducts + GetProductDetails, ShiweijiaProduct.cs:226-461)
# ---------------------------------------------------------------------------


@dataclass
class DetailParse:
    ok: bool
    error: str | None = None
    product_id: int | None = None
    brand_id: int | None = None
    brand_name: str | None = None
    brand_img_link: str | None = None  # raw link; uploaded on brand insert
    product_code: str | None = None
    name: str = ""
    style: str = ""
    sale_price: str | None = None
    cost_price: str | None = None
    custom_price: str | None = None
    main_imgs_raw: list[str] = field(default_factory=list)
    detail_imgs_raw: list[str] = field(default_factory=list)
    specifications: str | None = None  # Newtonsoft dict JSON or None
    features: str | None = None  # Newtonsoft dict JSON or None
    thumbnails_link: str | None = None  # raw link (fixtures always give one)
    variant_ids: list[int] = field(default_factory=list)
    text: str = ""  # byte-identical extraction target
    main_imgs_json: str = "[]"  # persisted column: uploaded urls (Newtonsoft)
    detail_imgs_json: str = "[]"
    attribute_json: str = ""


def _get_specifications(paras_groups) -> str:
    """GetSpecifications (ShiweijiaProduct.cs:271-296): flatten group paras
    into one dict, skip empty values, STOP EVERYTHING at the first duplicate
    key (Dictionary.Add throws; the try wraps the whole loop)."""
    dic: dict[str, str] = {}
    try:
        for group in paras_groups:
            paras = group.get("Paras")
            if isinstance(paras, list):
                for para in paras:
                    value = para["ParameterValue"]
                    if value:  # IsNullOrEmpty skip
                        if para["Name"] in dic:
                            raise KeyError(para["Name"])  # Dictionary.Add throws
                        dic[para["Name"]] = value
    except Exception:
        pass  # logged + partial dict kept in the reference
    return newtonsoft_dict(dic)


def _get_features(spec_groups) -> dict[str, dict[int, str]]:
    """GetFeatures (ShiweijiaProduct.cs:338-361): Name → {Id: Name}; any
    duplicate (group name or value id) truncates the whole build."""
    dic: dict[str, dict[int, str]] = {}
    try:
        for item in spec_groups:
            values_el = item.get("Values")
            if isinstance(values_el, list):
                values: dict[int, str] = {}
                for v in values_el:
                    if v["Id"] in values:
                        raise KeyError(v["Id"])
                    values[v["Id"]] = v["Name"]
                if item["Name"] in dic:
                    raise KeyError(item["Name"])
                dic[item["Name"]] = values
    except Exception:
        pass
    return dic


def parse_detail(data: dict) -> DetailParse:
    """Parse one detail page's Data element. Pure function of the page —
    this is the per-row extraction whose rendered text must be matched
    byte-identically by the Spark UDF."""
    p = DetailParse(ok=True)
    p.product_id = data["ID"]
    p.brand_id = data["BrandId"]
    p.brand_name = data.get("Brand")
    p.brand_img_link = data.get("BrandImg")
    p.product_code = data.get("ProductCode")
    p.name = data.get("Name", "")
    p.style = data.get("Pattern", "")
    p.sale_price = decimal_str(data["SalePrice"])

    def _arr(tag):
        v = data.get(tag)
        return v if isinstance(v, list) else []

    p.main_imgs_raw = _arr("MainImgs")
    p.detail_imgs_raw = _arr("DetailImgs")
    main_imgs_stj = stj_string_list(p.main_imgs_raw)  # ArrayToJson output

    paras = data.get("Paras")
    if isinstance(paras, list):
        p.specifications = _get_specifications(paras)

    spec = data.get("Specification")
    ps = data.get("ProductSpecifications")
    if isinstance(spec, list) and isinstance(ps, list):
        features = _get_features(spec)
        # GetAllProducts (ShiweijiaProduct.cs:298-332)
        for item in ps:
            pid = item["ProductId"]
            try:
                if pid == p.product_id:
                    feature_dic: dict[str, str] = {}
                    sv_ids = item.get("SpecificationValueIds")
                    if isinstance(sv_ids, list):
                        for vid in sv_ids:
                            fname = None
                            for k, vals in features.items():  # FirstOrDefault
                                if vid in vals:
                                    fname = k
                                    break
                            if fname is None:
                                raise KeyError(vid)  # NullReference analog
                            if fname in feature_dic:
                                continue  # duplicate feature name skipped
                            feature_dic[fname] = features[fname][vid]
                    p.thumbnails_link = item.get("Thumbnails", main_imgs_stj)
                    p.features = newtonsoft_dict(feature_dic)
                    p.cost_price = decimal_str(item["Price1"])
                    p.custom_price = decimal_str(item["Price2"])
                p.variant_ids.append(pid)
            except Exception:
                continue  # per-item isolation (ShiweijiaProduct.cs:326-329)

    # --- Submit-time mutations (Submit + GetProductDetails,
    #     ShiweijiaProduct.cs:392-461): uploads + rendered text ---
    uploaded_main = [upload_url(u) for u in p.main_imgs_raw if u]
    p.main_imgs_json = newtonsoft_str_list(uploaded_main)
    uploaded_detail = [upload_url(u) for u in p.detail_imgs_raw if u]
    p.detail_imgs_json = newtonsoft_str_list(uploaded_detail)

    parts: list[str] = []
    if p.specifications is not None:
        spec_dic = json.loads(p.specifications)
        for k, v in spec_dic.items():
            parts.append(f"<p>{k}:{v}</p>")
    for u in uploaded_detail:
        parts.append(f'<img src="{u}" />')
    p.text = "".join(parts)

    # Attribute json for the submission payload
    if p.features:
        feat = json.loads(p.features)
        p.attribute_json = newtonsoft_attr_list(
            [(k, v) for k, v in feat.items() if v]
        )
    return p


def render_detail_text(data: dict) -> str:
    """Ground-truth `text` for a detail page body (the byte-identical
    contract of BASELINE.json input_hint)."""
    return parse_detail(data).text


# ---------------------------------------------------------------------------
# Category-page parsing (ShiweijiaCategory.cs:83-107): pre-order DFS
# ---------------------------------------------------------------------------


def parse_categories(data: list) -> list[dict]:
    """Flatten the category tree pre-order into rows
    (id, name, img_link, parent_id); discovery order == insertion order
    == the reference's UpdateDate order (SURVEY.md §7.3-2)."""
    rows: list[dict] = []

    def walk(elements, parent_id):
        for item in elements:
            rows.append(
                {
                    "id": item["ID"],
                    "category_name": item.get("CategoryName"),
                    "category_img_link": item.get("CategoryImg"),
                    "parent_id": parent_id,
                }
            )
            subs = item.get("Subs")
            if subs:
                walk(subs, item["ID"])

    walk(data, None)
    return rows


# ---------------------------------------------------------------------------
# Synthetic-corpus URL scheme (shared with fixtures + engine)
# ---------------------------------------------------------------------------


def host_of_url(url: str) -> str:
    return urlsplit(url).hostname


def category_url(host: str) -> str:
    return f"https://{host}/api/mall/getcategory"


def listing_url(host: str, category_id: int, page: int) -> str:
    return (
        f"https://{host}/api/mall/queryproductbypage"
        f"?category={category_id}&page={page}"
    )


def detail_url(host: str, product_id: int, category_id: int) -> str:
    return (
        f"https://{host}/api/product/getproductdetail"
        f"?id={product_id}&category={category_id}"
    )


def classify_url(url: str) -> tuple[str, dict]:
    """Page kind + query metadata. The synthetic corpus encodes the
    reference's (url, param) frontier pair into the URL itself."""
    parts = urlsplit(url)
    q = {k: v[0] for k, v in parse_qs(parts.query).items()}
    if parts.path.endswith("/getcategory"):
        return "category", {}
    if parts.path.endswith("/queryproductbypage"):
        return "listing", {"category": int(q["category"]), "page": int(q["page"])}
    if parts.path.endswith("/getproductdetail"):
        return "detail", {"category": int(q["category"]), "id": int(q["id"])}
    return "other", {}


def submission_payload(product: dict, categories_by_id: dict) -> dict:
    """S8 payload (Submit, ShiweijiaProduct.cs:392-434): fixed key
    order, parent/child category two-hop, decimal prices as strings,
    coverPath thumbnails-or-first-pic fallback."""
    child = categories_by_id[product["category_id"]]
    parent = categories_by_id.get(child["parent_id"], {})
    main_list = json.loads(product["main_imgs"] or "[]")
    return {
        "platformType": "1",
        "materialTypeID": "5",
        "typeID": "3",
        "productCode": product["product_code"],
        "productID": str(product["id"]),
        "materialName": product["name"],
        "categoryName": parent.get("category_name"),
        "categoryCoverPath": parent.get("category_img"),
        "mincategoryName": child["category_name"],
        "mincategoryCoverPath": child["category_img"],
        "brandName": product["brand_name"],
        "brandCoverPath": product["brand_img"],
        "marketPrice": product["sale_price"],
        "floorPrice": product["cost_price"] or "0",
        "discountPrice": product["custom_price"] or "0",
        "Attribute": product["attribute_json"],
        "coverPath": product["thumbnails"]
        or (main_list[0] if main_list else None),
        "materialPicture": product["main_imgs"],
        "materialDetails": product["text"],
    }


# ---------------------------------------------------------------------------
# Priority paths + politeness budget (shared contract with the engine)
# ---------------------------------------------------------------------------


def path_key(components: list[int]) -> str:
    """Fixed-width lexicographic discovery path. Zero-padding makes string
    order == numeric order in Spark, DuckDB and Python alike."""
    return "/".join(f"{c:010d}" for c in components)


def host_budget(crawl_delay_ms: int, budget_ms: int, max_k: int = 1000) -> int:
    """Per-host fetches allowed in one superstep (politeness take-k, O3)."""
    if crawl_delay_ms <= 0:
        return max_k
    return min(max_k, max(1, budget_ms // crawl_delay_ms))


# ---------------------------------------------------------------------------
# Superstep crawl simulation (the golden run)
# ---------------------------------------------------------------------------


@dataclass
class Golden:
    crawl_order: list[tuple[str, int, int]]  # (url, superstep, host_rank)
    url_seen: set[str]
    categories: list[dict]
    brands: list[dict]
    products: list[dict]
    text_by_url: dict[str, str]
    img_cache: dict[str, str]  # md5 -> uploaded url
    supersteps: int


def simulate_crawl(
    pages: dict[str, bytes],
    seeds: list[dict],
    robots: dict[str, dict],
    registrable_domain,
    budget_ms: int = 30000,
    max_k: int = 1000,
    max_supersteps: int = 10_000,
) -> Golden:
    """Simulate the whole crawl under the superstep politeness contract.

    ``pages``: url -> raw html bytes (the corpus). ``seeds``: rows with
    url/seed_order. ``robots``: host -> {crawl_delay_ms, disallow_prefixes}.
    """
    frontier: dict[str, str] = {}  # url -> priority path
    seen: set[str] = set()
    crawl_order: list[tuple[str, int, int]] = []
    categories: list[dict] = []
    cat_ids: set[int] = set()
    seed_idx_by_cat: dict[int, int] = {}  # leaf category id -> seed index
    brands: dict[int, dict] = {}
    products: list[dict] = []
    text_by_url: dict[str, str] = {}
    img_cache: dict[str, str] = {}

    def allowed(url: str, host: str) -> bool:
        rb = robots.get(host)
        if not rb:
            return True
        path = urlsplit(url).path or "/"
        return not any(path.startswith(p) for p in rb.get("disallow_prefixes") or [])

    def register_imgs(links):
        out = []
        for link in links:
            if not link:
                continue
            key = img_md5_key(link)
            if key not in img_cache:
                img_cache[key] = upload_url(link)
            out.append(img_cache[key])
        return out

    for s in sorted(seeds, key=lambda r: (r["seed_order"], r["url"])):
        host = registrable_domain(s["url"])
        if allowed(s["url"], host):
            frontier[s["url"]] = path_key([s["seed_order"]])

    superstep = 0
    while frontier and superstep < max_supersteps:
        superstep += 1
        # politeness take-k per host, priority order (path, url)
        by_host: dict[str, list[tuple[str, str]]] = {}
        for url, pk in frontier.items():
            by_host.setdefault(registrable_domain(url), []).append((pk, url))
        batch: list[tuple[str, str, str, int]] = []  # (url, path, host, rank)
        for host, items in by_host.items():
            delay = robots.get(host, {}).get("crawl_delay_ms", 3000)
            k = host_budget(delay, budget_ms, max_k)
            items.sort()
            for rank, (pk, url) in enumerate(items[:k], start=1):
                batch.append((url, pk, host, rank))
        batch.sort(key=lambda t: (t[2], t[3]))  # deterministic global order
        successors: list[tuple[str, str, str]] = []  # (url, path, host)

        for url, my_path, host, rank in batch:
            crawl_order.append((url, superstep, rank))
            seen.add(url)
            del frontier[url]
            body = pages.get(url)
            if body is None:
                continue  # 404 → engine quarantines
            try:
                doc = json.loads(body.decode("utf-8"))
            except Exception:
                continue
            if not doc.get("IsSuccess"):
                continue  # quarantine path (P5)
            kind, meta = classify_url(url)
            site = host_of_url(url)

            if kind == "category":
                rows = parse_categories(doc["Data"])
                for row in rows:
                    if row["id"] in cat_ids:
                        continue  # insert-if-absent (J7)
                    cat_ids.add(row["id"])
                    img = row.pop("category_img_link")
                    row = dict(row, category_img=register_imgs([img])[0] if img else "")
                    categories.append(row)
                # product seeds: ParentId != null, UpdateDate(=pre-order) asc
                for row in categories:
                    if row["parent_id"] is None or row["id"] in seed_idx_by_cat:
                        continue
                    seed_idx_by_cat[row["id"]] = len(seed_idx_by_cat)
                for row in rows:
                    if row["parent_id"] is None:
                        continue
                    lurl = listing_url(site, row["id"], 1)
                    sidx = seed_idx_by_cat[row["id"]]
                    successors.append((lurl, path_key([sidx, 1, 0]), host))

            elif kind == "listing":
                data = doc.get("Data")
                if not data or "Rows" not in data:
                    continue
                cat_id, page_idx = meta["category"], data["PageIndex"]
                sidx = seed_idx_by_cat.get(cat_id, 10**9)
                total = data["Total"]
                page_count = -(-total // 50)  # ceil, pageSize=50
                for pos, row in enumerate(data["Rows"], start=1):
                    durl = detail_url(site, row["ID"], cat_id)
                    successors.append((durl, path_key([sidx, page_idx, pos]), host))
                if page_idx < page_count:
                    nurl = listing_url(site, cat_id, page_idx + 1)
                    successors.append(
                        (nurl, path_key([sidx, page_idx + 1, 0]), host)
                    )

            elif kind == "detail":
                p = parse_detail(doc["Data"])
                text_by_url[url] = p.text
                if p.brand_id not in brands:
                    brands[p.brand_id] = {
                        "id": p.brand_id,
                        "brand_name": p.brand_name,
                        "brand_img": (
                            register_imgs([p.brand_img_link])[0]
                            if p.brand_img_link
                            else None
                        ),
                    }
                register_imgs([p.thumbnails_link] if p.thumbnails_link else [])
                register_imgs(p.main_imgs_raw)
                register_imgs(p.detail_imgs_raw)
                brand = brands[p.brand_id]
                products.append(
                    {
                        "id": p.product_id,
                        "product_code": p.product_code,
                        "brand_id": p.brand_id,
                        "brand_name": brand["brand_name"],
                        "brand_img": brand["brand_img"],
                        "category_id": meta["category"],
                        "style": p.style,
                        "name": p.name,
                        "sale_price": p.sale_price,
                        "cost_price": p.cost_price,
                        "custom_price": p.custom_price,
                        "main_imgs": p.main_imgs_json,
                        "detail_imgs": p.detail_imgs_json,
                        "specifications": p.specifications,
                        "thumbnails": (
                            img_cache[img_md5_key(p.thumbnails_link)]
                            if p.thumbnails_link
                            else None
                        ),
                        "features": p.features,
                        "attribute_json": p.attribute_json,
                        "text": p.text,
                        "url": url,
                    }
                )
                # variant expansion in list order (DFS-equivalent, §3.3):
                # successor path extends the parent detail's own path
                for vpos, vid in enumerate(p.variant_ids, start=1):
                    vurl = detail_url(site, vid, meta["category"])
                    successors.append(
                        (vurl, my_path + "/" + f"{vpos:010d}", host)
                    )

        # union successors into frontier: anti-join vs seen ∪ frontier,
        # first (lowest-path) writer wins on priority (U1/U3)
        for u, pk, host in sorted(successors, key=lambda t: (t[1], t[0])):
            if u in seen or u in frontier:
                continue
            if not allowed(u, host):
                continue
            frontier[u] = pk

    return Golden(
        crawl_order=crawl_order,
        url_seen=seen,
        categories=categories,
        brands=list(brands.values()),
        products=products,
        text_by_url=text_by_url,
        img_cache=dict(img_cache),
        supersteps=superstep,
    )
