"""PII scrub operator: Arrow-RE2 vs Python-re scalar reference parity on
adversarial fixtures, DuckDB twin equivalence, and the gate-entry shape."""

from __future__ import annotations

import re

import pyarrow as pa

from smse_backend_ray.pipelines import pii

ADVERSARIAL = [
    "contact src0@mail-es.example.com host 12.3.0.45 key tok_0000000000000042",
    "a@b.co then 999.999.999.999 and tok_123 too short",
    "nested a.b-c%d+e@sub.domain.org tail",
    "",
    "tok_1234567890123456tok_1234567890123456",  # adjacent, non-overlapping
    "ip runs 1.2.3.4.5.6 double 1.2.3.4 end",
    "at-sign only @ not an email; dot only . not an ip",
    "UPPER@CASE.COM and MiXeD@case.Org",
    "email.with.trailing.dot@example.com.",  # trailing dot stays outside
    "unicode müller@straße.de stays partial",  # non-ASCII local part
    "v4-ish 256.300.1.2 still counted (frozen spec: no octet range check)",
    "tok_12345678901234567 is 17 digits -> matches its 16-digit prefix",
]


def _scalar(texts: list[str]) -> dict:
    out = {f"n_{n}": [] for n, _, _ in pii.PII_RULES}
    out["redacted"] = []
    for t in texts:
        red = t
        for name, pat, repl in pii.PII_RULES:
            out[f"n_{name}"].append(len(re.findall(f"({pat})", t)))
            red = re.sub(pat, repl, red)
        out["redacted"].append(red)
    return out


def test_pii_scan_matches_scalar_re():
    got = pii.pii_scan_batch(pa.array(ADVERSARIAL))
    want = _scalar(ADVERSARIAL)
    for k in want:
        assert (
            [v.as_py() for v in got[k]] == want[k]
        ), f"column {k} diverged from the Python-re reference"


def test_pii_scan_matches_duckdb():
    import duckdb

    e, i, k = pii.PII_EMAIL_RE, pii.PII_IPV4_RE, pii.PII_TOKEN_RE
    rows = duckdb.sql(
        f"""
        SELECT len(regexp_extract_all(t, '{e}')),
               len(regexp_extract_all(t, '{i}')),
               len(regexp_extract_all(t, '{k}')),
               regexp_replace(regexp_replace(regexp_replace(
                 t, '{e}', '<EMAIL>', 'g'), '{i}', '<IP>', 'g'),
                 '{k}', '<TOKEN>', 'g')
        FROM (SELECT unnest($1::VARCHAR[]) AS t)
        """,
        params=[ADVERSARIAL],
    ).fetchall()
    got = pii.pii_scan_batch(pa.array(ADVERSARIAL))
    assert [r[0] for r in rows] == [v.as_py() for v in got["n_email"]]
    assert [r[1] for r in rows] == [v.as_py() for v in got["n_ipv4"]]
    assert [r[2] for r in rows] == [v.as_py() for v in got["n_token"]]
    assert [r[3] for r in rows] == [v.as_py() for v in got["redacted"]]


def test_doc_pii_matches_sql(ray_session, sf_dir, duck):
    t = pii.doc_pii(sf_dir)
    want = duck.sql(pii.pii_sql()).arrow()
    assert t.to_pylist() == want.to_pylist()
    # the augmentation genuinely exercises every rule at gate scale
    import numpy as np

    assert np.asarray(t["n_email"]).sum() > 0
    assert np.asarray(t["n_ipv4"]).sum() > 0
    assert np.asarray(t["n_token"]).sum() > 0
    # redaction removed every detected match
    red = t["redacted"].to_pylist()
    again = pii.pii_scan_batch(pa.array(red))
    for name, _, _ in pii.PII_RULES:
        assert sum(v.as_py() for v in again[f"n_{name}"]) == 0
