"""Deterministic URL canonicalization (crawl-dedup key).

A web corpus keyed on raw URL strings over-counts: the same resource
appears as ``HTTP://Example.COM:80/a?b=2&a=1#frag`` and
``http://example.com/a?a=1&b=2``. Canonicalizing before any per-URL
dedup / latest-crawl upsert is standard crawl hygiene (cf. RFC 3986
§6 syntax-based normalization — the subset below is the
deterministic, SQL-replicable core; dot-segment resolution and
percent-decoding are intentionally out of scope).

Rules (applied in order; a URL that does not match
``scheme://authority...`` passes through unchanged with
``normalized = 0``):

1. trim surrounding whitespace; strip the ``#fragment``;
2. lowercase the scheme and the host[:port];
3. drop the default port (``:80`` for http, ``:443`` for https);
4. empty path -> ``/``; otherwise strip ONE trailing ``/`` unless the
   path is exactly ``/``;
5. split the query on ``&``, drop empty segments, SORT
   lexicographically, rejoin (dropping the ``?`` when nothing is
   left).

Everything is a shuffle-free ``map_batches``; the per-row work is
vectorized pandas ``.str`` regex plus an explode/sort/groupby-join
for the query-parameter sort (no Python loop over rows). The DuckDB
oracle applies the identical regex steps with
``list_sort(string_split(...))``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from .infer import normalize_blocks

URLNORM_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("url", pa.string()),
        ("url_norm", pa.string()),
        ("normalized", pa.int64()),
    ]
)

# scheme :// host[:port] path(?query)?   — fragment already stripped
_URL_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://([^/?#]*)([^?#]*)(?:\?(.*))?$"


def _sort_query(q: pd.Series) -> pd.Series:
    """Vectorized query-param sort: explode on '&', drop empties,
    sort, group-join — never a per-row Python sort."""
    idx = pd.RangeIndex(len(q))
    parts = q.fillna("").str.split("&").explode()
    parts = parts[parts != ""]
    if len(parts) == 0:
        return pd.Series([""] * len(q), index=idx, dtype=object)
    parts = parts.rename("p").reset_index()
    parts = parts.sort_values(["index", "p"], kind="stable")
    joined = parts.groupby("index", sort=False)["p"].agg("&".join)
    return joined.reindex(idx, fill_value="").astype(object)


def normalize_urls_frame(batch: pd.DataFrame, url_col: str = "url") -> pd.DataFrame:
    """``(doc_id, url, url_norm, normalized)`` for one in-memory frame
    — the kernel ``url_normalize`` maps over blocks."""
    raw = batch[url_col].fillna("").astype(str).str.strip()
    nofrag = raw.str.replace(r"#.*$", "", regex=True, n=1)
    m = nofrag.str.extract(_URL_RE)
    m.columns = ["scheme", "hostport", "path", "query"]
    ok = m["scheme"].notna()

    scheme = m["scheme"].str.lower()
    host = m["hostport"].str.lower()
    host = host.where(
        ~((scheme == "http") & host.str.endswith(":80")), host.str.replace(r":80$", "", regex=True)
    )
    host = host.where(
        ~((scheme == "https") & host.str.endswith(":443")),
        host.str.replace(r":443$", "", regex=True),
    )
    path = m["path"].fillna("")
    path = path.where(path != "", "/")
    strip_slash = (path != "/") & path.str.endswith("/")
    path = path.where(~strip_slash, path.str.replace(r"/$", "", regex=True))
    query = _sort_query(m["query"].reset_index(drop=True)).set_axis(m.index)

    norm = scheme + "://" + host + path + np.where(query != "", "?" + query.astype(str), "")
    out = pd.DataFrame(
        {
            "doc_id": batch["doc_id"].to_numpy(np.int64),
            "url": raw,
            "url_norm": np.where(ok, norm, raw),
            "normalized": ok.to_numpy().astype(np.int64),
        }
    )
    return out


def url_normalize(
    ds: ray.data.Dataset, *, url_col: str = "url", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Shuffle-free canonicalization pass over a URL column."""

    def _norm(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series(dtype="int64"),
                    "url": pd.Series(dtype=object),
                    "url_norm": pd.Series(dtype=object),
                    "normalized": pd.Series(dtype="int64"),
                }
            )
        b = b.rename(columns={id_col: "doc_id"}) if id_col != "doc_id" else b
        return normalize_urls_frame(b, url_col)

    return normalize_blocks(
        ds.select_columns([id_col, url_col]).map_batches(
            _norm, batch_format="pandas", batch_size=None
        ),
        URLNORM_SCHEMA,
    )
