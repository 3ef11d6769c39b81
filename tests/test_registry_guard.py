"""Registry integrity guards (no Spark needed, runs fast).

VERDICT r2 item 2: a duplicate literal key in ``SHARED_SQL`` silently
shadowed the round-1 ``q14_promo_share`` query — the dict keeps the last
binding, so coverage shrank by one query and the ``>= N`` size floor
couldn't notice a same-name overwrite.  This test AST-parses the module
and rejects duplicate literal keys in every module-level dict literal
that feeds the registry.
"""

import ast
import collections
import pathlib

ENTRY = pathlib.Path(__file__).resolve().parent.parent / "__spark_entry__.py"

GUARDED = {"SHARED_SQL", "QUERIES", "ORACLES"}


def _module_dict_literals():
    tree = ast.parse(ENTRY.read_text())
    out = {}
    for node in tree.body:
        targets = []
        if isinstance(node, ast.Assign):
            targets = [t.id for t in node.targets if isinstance(t, ast.Name)]
            value = node.value
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            targets = [node.target.id]
            value = node.value
        else:
            continue
        if not isinstance(value, ast.Dict):
            continue
        for name in targets:
            out[name] = value
    return out


def test_guarded_dicts_exist():
    found = set(_module_dict_literals())
    assert GUARDED <= found, f"missing registry dicts: {GUARDED - found}"


def test_no_duplicate_literal_keys():
    for name, node in _module_dict_literals().items():
        keys = [
            k.value
            for k in node.keys
            if isinstance(k, ast.Constant) and isinstance(k.value, str)
        ]
        dupes = [k for k, n in collections.Counter(keys).items() if n > 1]
        assert not dupes, f"duplicate keys in {name}: {dupes}"


def test_every_query_has_oracle_or_explicit_allowlisting():
    """VERDICT r3 item 8: rows-only queries (a ``queries()`` entry with
    no ``oracle_sql()`` entry) get only the driver's weak row-count
    check, so they must not accumulate silently.  Any genuinely
    non-SQL-expressible query must be listed in ``ROWS_ONLY_ALLOWED`` in
    ``__spark_entry__.py`` next to a comment saying why DuckDB can't
    replay it."""
    import __spark_entry__ as e

    allowed = set(getattr(e, "ROWS_ONLY_ALLOWED", ()))
    rows_only = set(e.queries()) - set(e.oracle_sql())
    unexplained = rows_only - allowed
    assert not unexplained, (
        f"queries without an oracle and not allowlisted: "
        f"{sorted(unexplained)} — add a DuckDB oracle or add the name to "
        f"ROWS_ONLY_ALLOWED with a why-comment"
    )
    stale = allowed - rows_only
    assert not stale, (
        f"ROWS_ONLY_ALLOWED entries that DO have oracles (or were "
        f"removed): {sorted(stale)} — drop them from the allowlist"
    )


def test_registry_names_unique_across_sources():
    """A SHARED_SQL name must not also appear as a QUERIES literal key —
    queries() would silently prefer the SHARED_SQL version."""
    dicts = _module_dict_literals()

    def keys(name):
        return {
            k.value
            for k in dicts[name].keys
            if isinstance(k, ast.Constant) and isinstance(k.value, str)
        }

    overlap = keys("SHARED_SQL") & keys("QUERIES")
    assert not overlap, f"names defined in both SHARED_SQL and QUERIES: {overlap}"


def test_no_duplicate_module_level_constant_bindings():
    """Round 6: wave 6r defined a second ``ORACLE_BOILERPLATE``, silently
    rebinding boilerplate_topk's oracle to boilerplate_shingles' SQL —
    rows/schema/hash all diverged, caught only by the full-registry
    sweep.  Python rebinds without a whisper, so reject ANY module-level
    constant (ORACLE_*/SHARED_*/QUERIES-feeding name) assigned twice."""
    tree = ast.parse(ENTRY.read_text())
    seen = collections.Counter()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        elif isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            names = [node.target.id]
        else:
            continue
        for n in names:
            if n.isupper():
                seen[n] += 1
    dups = sorted(n for n, c in seen.items() if c > 1)
    assert not dups, (
        f"module-level constants bound more than once (the later binding "
        f"silently wins): {dups}"
    )
