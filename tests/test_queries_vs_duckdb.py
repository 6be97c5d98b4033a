"""Every queries() entry vs its DuckDB oracle at sf0.001 — the same
row-count + schema-width + order-insensitive value comparison the
driver performs at sf0.01."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def canon_rows(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


ORACLED = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(ORACLED))


def _family(type_name):
    """Collapse engine-specific type names to a comparable family.

    The driver's value hash distinguishes e.g. DuckDB HUGEINT (int128)
    from Spark BIGINT even when values are equal — round 1 lost two
    CORRECTNESS rows to exactly that, so oracles must type-match, not
    just value-match."""
    t = type_name.lower()
    if "hugeint" in t or "int128" in t or "decimal" in t:
        return t  # never collapse: these are the hash-mismatch traps
    if "int" in t or t in ("long", "short", "byte", "tinyint"):
        return "int"
    if t in ("float", "double", "real") or "float" in t or "double" in t:
        return "float"
    if "char" in t or "string" in t or t == "text":
        return "str"
    if "bool" in t:
        return "bool"
    if "timestamp" in t:
        return "timestamp"
    return t


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(name, spark, duck):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(entry_mod.oracle_sql()[name])
    dcols = list(rel.columns)
    dtypes = [str(t) for t in rel.types]
    drows = rel.fetchall()

    sfam = {
        f.name.lower(): _family(f.dataType.simpleString())
        for f in sdf.schema.fields
    }
    for c, t in zip(dcols, dtypes):
        assert sfam.get(c.lower()) == _family(t), (
            f"{name}.{c}: dtype family differs "
            f"(spark={sfam.get(c.lower())!r}, duckdb={_family(t)!r}) — "
            f"the driver's value hash will mismatch; CAST in the oracle"
        )

    assert sorted(c.lower() for c in scols) == sorted(
        c.lower() for c in dcols
    ), f"{name}: column names differ"
    assert len(srows) == len(drows), f"{name}: row counts differ"
    assert canon_rows(srows, [c.lower() for c in scols]) == canon_rows(
        drows, [c.lower() for c in dcols]
    ), f"{name}: values differ"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark):
    qfn = entry_mod.queries()[name]
    sdf = qfn(spark, SF_DIR)
    assert sdf.count() >= 0
    assert len(sdf.schema.fields) > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
