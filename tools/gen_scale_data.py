"""Generate an sf1.0-equivalent synthetic star schema (10x sf0.1).

Usage: python tools/gen_scale_data.py [out_dir] [--scale=K]
       (default /tmp/sf1.0, K=1; --scale=10 yields an sf10-equivalent
        universe for the two-decade scaling sweep, r8)

Used for the r4 10x scale differential (PERFORMANCE.md): the driver
only ships sf{0.001,0.01,0.1}, so scale-sweep fixtures are generated
locally. NOT driver data — never write into /root/testdata.

Mirrors /root/testdata schemas and value domains (profiled from sf0.1):
cent-exact money, integer quantities, 0.01-step discounts — the same
properties the cross-engine float policy relies on. Seed fixed.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

US_DAY = 86_400_000_000


def row_group_size(num_rows: int) -> int:
    """Proportional row groups: pyarrow's default (1Mi rows) writes the
    500k-row sf10 documents table as ONE row group, which Spark can
    only scan as ONE task — the r8 two-decade sweep measured 14-17x
    second-decade wall on the doc/embedding lanes from exactly this,
    all of which collapsed back to <=3x once the files carried
    proportional splits. ~32 groups per table keeps every scan
    parallelizable at any --scale without changing any value.

    Importable (VERDICT r8 #4) so tests/test_input_layout.py can pin
    the policy arithmetic without running a full generation.
    """
    return max(16_384, num_rows // 32)


_args = [a for a in sys.argv[1:] if not a.startswith("--")]
OUT = _args[0] if _args else "/tmp/sf1.0"
SCALE = 1
for _a in sys.argv[1:]:
    if _a.startswith("--scale="):
        SCALE = int(_a.split("=", 1)[1])

N_CUST, N_SUPP, N_PART = 150_000 * SCALE, 10_000 * SCALE, 200_000 * SCALE
N_ORDERS, LINES_PER_ORDER = 1_500_000 * SCALE, 4
N_EVENTS, N_USERS = 1_000_000 * SCALE, 15_000 * SCALE
N_DOCS, N_EMB, DIM = 50_000 * SCALE, 20_000 * SCALE, 64


def w(name, table):
    pq.write_table(
        table,
        os.path.join(OUT, name + ".parquet"),
        row_group_size=row_group_size(table.num_rows),
    )
    print(name, table.num_rows)


if __name__ == "__main__":
    # Generation body: guarded so the row-group policy above is
    # importable by tests without side effects.
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(4242)

    # region / nation: tiny dims, copy verbatim from sf0.1
    for t in ("region", "nation"):
        w(t, pq.read_table(f"/root/testdata/sf0.1/{t}.parquet"))

    # customer
    w("customer", pa.table({
        "c_custkey": pa.array(np.arange(N_CUST), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)], pa.string()),
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST).astype(np.int32), pa.int32()),
        "c_acctbal": pa.array(rng.integers(-99_999, 1_000_000, N_CUST) / 100.0, pa.float64()),
        "c_mktsegment": pa.array(np.array(
            ["MACHINERY", "AUTOMOBILE", "FURNITURE", "BUILDING", "HOUSEHOLD"]
        )[rng.integers(0, 5, N_CUST)], pa.string()),
    }))

    # supplier
    w("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(N_SUPP), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)], pa.string()),
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP).astype(np.int32), pa.int32()),
        "s_acctbal": pa.array(rng.integers(-99_999, 1_000_000, N_SUPP) / 100.0, pa.float64()),
    }))

    # part
    ADJ = ["large", "hot", "blue", "small", "dark", "light", "round", "flat"]
    NOUN = ["ring", "bolt", "screw", "panel", "wheel", "pipe", "gear", "valve"]
    TYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "MEDIUM", "PROMO"]
    ai = rng.integers(0, len(ADJ), N_PART)
    ni = rng.integers(0, len(NOUN), N_PART)
    w("part", pa.table({
        "p_partkey": pa.array(np.arange(N_PART), pa.int64()),
        "p_name": pa.array([f"{ADJ[a]} {NOUN[n]}" for a, n in zip(ai, ni)], pa.string()),
        "p_brand": pa.array([f"Brand#{b}" for b in rng.integers(0, 25, N_PART)], pa.string()),
        "p_type": pa.array(np.array(TYPES)[rng.integers(0, len(TYPES), N_PART)], pa.string()),
        "p_size": pa.array(rng.integers(1, 51, N_PART).astype(np.int32), pa.int32()),
        "p_retailprice": pa.array(9000 / 10.0 + (np.arange(N_PART) % 1000) / 10.0, pa.float64()),
    }))

    # orders (cent-exact totalprice; midnight timestamps over 1995-2001)
    D0 = np.datetime64("1995-01-01", "us").astype(np.int64)
    odate_days = rng.integers(0, 2404, N_ORDERS)  # through 2001-08-01

    w("orders", pa.table({
        "o_orderkey": pa.array(np.arange(N_ORDERS), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORDERS), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, N_ORDERS)], pa.string()),
        "o_totalprice": pa.array(rng.integers(100_191, 49_999_319, N_ORDERS) / 100.0, pa.float64()),
        "o_orderdate": pa.array((D0 + odate_days * US_DAY).view("datetime64[us]"), pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        )[rng.integers(0, 5, N_ORDERS)], pa.string()),
    }))

    # lineitem: exactly 4 lines per order, cent-exact prices
    N_LI = N_ORDERS * LINES_PER_ORDER
    qty = rng.integers(1, 51, N_LI).astype(np.float64)
    ship_days = rng.integers(1, 2500, N_LI)
    w("lineitem", pa.table({
        "l_orderkey": pa.array(np.arange(N_LI) // LINES_PER_ORDER, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, N_PART, N_LI), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LI), pa.int64()),
        "l_linenumber": pa.array((np.arange(N_LI) % LINES_PER_ORDER + 1).astype(np.int32), pa.int32()),
        "l_quantity": pa.array(qty, pa.float64()),
        "l_extendedprice": pa.array(np.round(qty * rng.integers(90_068, 210_000, N_LI) / 100.0, 2), pa.float64()),
        "l_discount": pa.array(rng.integers(0, 11, N_LI) / 100.0, pa.float64()),
        "l_tax": pa.array(rng.integers(0, 9, N_LI) / 100.0, pa.float64()),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, N_LI)], pa.string()),
        "l_linestatus": pa.array(np.array(["F", "O"])[rng.integers(0, 2, N_LI)], pa.string()),
        "l_shipdate": pa.array((D0 + ship_days * US_DAY).view("datetime64[us]"), pa.timestamp("us")),
    }))

    # events: 1M over 30 days of Jan 2024, ts ascending, 2dp values
    E0 = np.datetime64("2024-01-01", "us").astype(np.int64)
    ts = np.sort(rng.integers(0, 30 * US_DAY, N_EVENTS))
    w("events", pa.table({
        "event_id": pa.array(np.arange(N_EVENTS), pa.int64()),
        "ts": pa.array((E0 + ts).view("datetime64[us]"), pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS), pa.int64()),
        "event_type": pa.array(np.array(
            ["view", "click", "purchase", "signup", "error"]
        )[rng.choice(5, N_EVENTS, p=[0.5, 0.25, 0.1, 0.05, 0.1])], pa.string()),
        "value": pa.array(rng.integers(0, 56_022, N_EVENTS) / 100.0, pa.float64()),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVENTS)], pa.string()),
    }))

    # documents: vocab-token texts, ~0.2% exact duplicates
    VOCAB = np.array([
        "batch", "part", "spark", "line", "column", "order", "small", "sort",
        "fast", "value", "scan", "query", "table", "hash", "group", "stream",
        "filter", "customer", "key", "vector", "agg", "slow", "join", "index",
        "cache", "disk", "node", "task", "stage", "shuffle", "plan", "cost",
    ] + [f"w{i}" for i in range(64)])
    texts = []
    for i in range(N_DOCS):
        n = int(rng.integers(8, 80))
        texts.append(" ".join(VOCAB[rng.integers(0, len(VOCAB), n)]))
    for i in range(0, 100):  # exact near-end duplicates of early docs
        texts[N_DOCS - 1 - i] = texts[i]
    w("documents", pa.table({
        "doc_id": pa.array(np.arange(N_DOCS), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(np.array(["en", "de", "es", "fr", "zh"])[
            rng.choice(5, N_DOCS, p=[0.6, 0.1, 0.1, 0.1, 0.1])], pa.string()),
        "source": pa.array([f"src{s}" for s in rng.integers(0, 20, N_DOCS)], pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }))

    # embeddings: float32, labels 0..9, a few exact dups + antipodes
    emb = rng.uniform(-1, 1, (N_EMB, DIM)).astype(np.float32)
    emb[101] = emb[100]            # exact duplicate pair
    emb[103] = -emb[102]           # antipode pair
    emb[105] = emb[104] * np.float32(1.0000001)  # near-duplicate
    w("embeddings", pa.table({
        "vec_id": pa.array(np.arange(N_EMB), pa.int64()),
        "embedding": pa.array([row for row in emb.tolist()], pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, N_EMB).astype(np.int32), pa.int32()),
    }))
    print("done ->", OUT)
