"""COVERAGE.md header count must match the live registry.

The round-4 verdict caught the header saying 239 while the registry
held 269 — this pins the documented count to `len(_all_queries())`
and `len(oracle_sql())` so it cannot silently drift again.
"""

import importlib.util
import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_cov", ROOT / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_coverage_header_matches_registry():
    mod = _entry_module()
    n_queries = len(mod._all_queries())
    n_oracle = len(mod.oracle_sql())
    assert n_queries == n_oracle, (
        f"registry/oracle gap: {n_queries} queries vs {n_oracle} oracles"
    )
    text = (ROOT / "COVERAGE.md").read_text()
    m = re.search(r"Queries:\s*(\d+)", text)
    assert m, "COVERAGE.md lost its 'Queries: N' header line"
    assert int(m.group(1)) == n_queries, (
        f"COVERAGE.md says {m.group(1)} queries but registry has "
        f"{n_queries} — update the header"
    )


def test_every_query_has_oracle():
    mod = _entry_module()
    qs = set(mod._all_queries())
    os_ = set(mod.oracle_sql())
    assert qs == os_, (
        f"only-in-queries={sorted(qs - os_)} only-in-oracle={sorted(os_ - qs)}"
    )
