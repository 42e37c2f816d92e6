"""URL canonicalization + per-domain curation primitives.

Beyond-reference capability — the one common pre-training curation
pass the engine lacked: web corpora key nearly everything (dedup
buckets, per-domain caps, blocklists, quality priors) on a CANONICAL
URL / domain, not the raw crawl string. Raw URLs differ in case,
scheme, `www.`, default ports, tracking parameters and fragments while
naming the same resource.

All pure JVM ``regexp_replace``/``regexp_extract`` chains — no UDF, no
shuffle; the whole canonicalization is a map over the scan, and the
per-domain cap reuses ``operators/sampling.py::stratified_sample``
(WindowGroupLimit — each task forwards at most n rows per domain).

Regex notes for engine portability (the DuckDB oracle twins these
chains): no lookarounds (RE2 has none — use a captured delimiter and
put it back), anchored alternations, and per-step fixups for the
dangling ``?``/``&`` a parameter-strip leaves behind.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tracking parameters stripped during canonicalization
TRACKING_PARAMS = r"utm_[^=&]*|fbclid|gclid|msclkid|ref"

_SCHEME_HOST_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url``:

    1. trim; lowercase the scheme://host prefix (path/query keep case);
    2. fold ``http://`` to ``https://``; strip a leading ``www.``;
    3. drop default ports ``:80``/``:443``;
    4. drop the fragment;
    5. strip tracking parameters (``TRACKING_PARAMS``), fixing up the
       ``?``/``&`` delimiters they leave dangling;
    6. drop a trailing ``/``.
    """
    u = F.trim(url)
    prefix = F.regexp_extract(u, _SCHEME_HOST_RE, 1)
    u = F.concat(F.lower(prefix), F.substr(u, F.length(prefix) + F.lit(1)))
    u = F.regexp_replace(u, r"^http://", "https://")
    u = F.regexp_replace(u, r"^https://www\.", "https://")
    u = F.regexp_replace(u, r"^(https://[^/?#:]*):(?:443|80)([/?#]|$)", r"$1$2")
    u = F.regexp_replace(u, r"#.*$", "")
    u = F.regexp_replace(u, rf"([?&])(?:{TRACKING_PARAMS})=[^&]*", r"$1")
    u = F.regexp_replace(u, r"([?&])&+", r"$1")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_host(url: Column) -> Column:
    """Host of an (ideally canonical) URL — regex, not ``parse_url``,
    so the DuckDB oracle can run the identical extraction."""
    return F.regexp_extract(url, r"^[a-z]+://([^/?#:]+)", 1)


def url_domain(url: Column) -> Column:
    """Grouping domain: canonical host with any ``www.`` already folded
    by ``canonical_url``. (A public-suffix-list registered-domain cut
    is a data-file swap on top of this — the topology is identical.)"""
    return url_host(canonical_url(url))


def domain_cap(df, url_col: str, n: int, id_col: str):
    """At most ``n`` rows per canonical domain, chosen in deterministic
    md5-of-id order — the standard anti-boilerplate / anti-SEO-farm
    cap. Output = input + ``domain`` + ``rk`` (rank within domain).
    One WindowGroupLimit exchange on the domain key; the cap holds at
    any corpus size because each task forwards at most n rows per
    domain before the shuffle."""
    from m3d_engine_spark.operators.sampling import stratified_sample

    with_domain = df.withColumn("domain", url_domain(F.col(url_col)))
    return stratified_sample(with_domain, ["domain"], n, id_col)
