"""Public-suffix snapshot for ``NET.REG_DOMAIN``.

BigQuery's ``NET.REG_DOMAIN`` (used by marketing attribution queries on
page/referrer URLs; the reference's GA4 exports carry full page URLs in
``event_params``) resolves the *registrable domain* against the public
Public Suffix List (publicsuffix.org, Mozilla-maintained, MPL-licensed
public data). The engine vendors a snapshot of the multi-label suffixes a
CRM/marketing dataset actually hits — the ccTLD second-level registries
(co.uk, com.au, co.jp, …) — and resolves everything else as the last two
labels.

Scope of the snapshot (documented divergence from the full PSL):
- two-label public suffixes only (no wildcard rules like ``*.ck``, no
  exception rules, no private-section suffixes like ``github.io``);
- unknown multi-label registries fall back to the last-two-labels rule.

The resolver is generated as a pure SQL expression (CASE + IN list over
regexp_extract'd label tails) so the SAME logic is expressible in Spark
SQL and in the DuckDB oracle — no UDF, stays inside whole-stage codegen,
and the suffix table is a compile-time constant (no join, no broadcast).
Regex dots are written as ``[.]`` so the pattern text needs no
dialect-specific escaping.
"""

from __future__ import annotations

# Snapshot of two-label public suffixes (publicsuffix.org ICANN section).
MULTI_PART_SUFFIXES: tuple[str, ...] = (
    # United Kingdom
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # Australia
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # Japan
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "maori.nz",
    "net.nz", "org.nz", "school.nz",
    # India
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "net.in", "org.in", "res.in",
    # Brazil
    "art.br", "com.br", "edu.br", "gov.br", "net.br", "org.br",
    # China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    # Mexico
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    # South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "net.za", "org.za", "web.za",
    # Singapore / Hong Kong / Taiwan / Malaysia
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "net.tw", "org.tw",
    "com.my", "edu.my", "gov.my", "net.my", "org.my",
    # South Korea
    "ac.kr", "co.kr", "go.kr", "ne.kr", "or.kr", "pe.kr", "re.kr",
    # Argentina / Colombia / Peru and other LatAm
    "com.ar", "edu.ar", "gob.ar", "net.ar", "org.ar",
    "com.co", "edu.co", "gov.co", "net.co", "org.co",
    "com.pe", "com.ve", "com.uy", "com.ec", "com.bo", "com.py",
    "com.gt", "com.do",
    # Turkey / Ukraine / Israel
    "com.tr", "edu.tr", "gen.tr", "gov.tr", "net.tr", "org.tr", "web.tr",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
    # Thailand / Indonesia / Vietnam / Philippines / Pakistan
    "ac.th", "co.th", "go.th", "in.th", "net.th", "or.th",
    "ac.id", "co.id", "go.id", "net.id", "or.id", "sch.id", "web.id",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph",
    "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
    # Africa / Middle East
    "co.ke", "com.ng", "com.eg", "com.sa", "com.ae", "co.tz", "co.ug",
    # Europe ccSLDs
    "com.pl", "edu.pl", "gov.pl", "net.pl", "org.pl", "waw.pl",
    "com.ru", "net.ru", "org.ru",
    "ac.at", "co.at", "gv.at", "or.at",
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "com.pt", "edu.pt", "gov.pt", "net.pt", "org.pt",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    "co.hu", "org.hu", "com.ro", "org.ro",
    # South Asia
    "ac.bd", "com.bd", "edu.bd", "gov.bd", "net.bd", "org.bd",
    "com.np", "edu.np", "gov.np", "net.np", "org.np",
    "com.lk", "edu.lk", "gov.lk", "net.lk", "org.lk",
)


def reg_domain_sql(host_sql: str) -> str:
    """Portable SQL for the registrable domain of a host expression.

    Works unchanged in Spark SQL and DuckDB: ``[.]`` avoids escape-
    sequence differences, ``NULLIF(..., '')`` maps "host IS itself a
    public suffix / has no dot" to NULL (BigQuery returns NULL there).
    """
    l2 = f"regexp_extract({host_sql}, '([^.]+[.][^.]+)$', 1)"
    l3 = f"regexp_extract({host_sql}, '([^.]+[.][^.]+[.][^.]+)$', 1)"
    in_list = ", ".join(f"'{s}'" for s in MULTI_PART_SUFFIXES)
    return (
        f"NULLIF(CASE WHEN lower({l2}) IN ({in_list}) "
        f"THEN {l3} ELSE {l2} END, '')"
    )
