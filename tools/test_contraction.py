#!/usr/bin/env python3
"""Independent validator for the oracle-side contraction-closure SQL
(LlmQueries.contractionClosure): exact connected components via three
min-neighbor star-contraction rounds + recursive closure on the residue.

Runs the EXACT SQL skeleton the Scala oracles embed against adversarial
graphs (paths, stars, cliques, random) and compares with union-find.
The skeleton below must be kept in sync with LlmQueries.scala's
`contractionClosure` val (same CTE chain, pairs → reach).

Usage: python3 tools/test_contraction.py [n_random_trials]
Exit 0 = all graphs match union-find.
"""
import sys
import random
import duckdb

# keep in sync with LlmQueries.contractionClosure (pairs → reach)
CONTRACTION = """
e0 AS MATERIALIZED (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
m1 AS MATERIALIZED (
  SELECT a AS node, least(a, min(b)) AS lbl FROM e0 GROUP BY a),
e1 AS MATERIALIZED (
  SELECT DISTINCT la.lbl AS a, lb.lbl AS b
  FROM e0 JOIN m1 la ON la.node = e0.a JOIN m1 lb ON lb.node = e0.b
  WHERE la.lbl <> lb.lbl),
m2 AS MATERIALIZED (
  SELECT a AS node, least(a, min(b)) AS lbl FROM e1 GROUP BY a),
e2 AS MATERIALIZED (
  SELECT DISTINCT la.lbl AS a, lb.lbl AS b
  FROM e1 JOIN m2 la ON la.node = e1.a JOIN m2 lb ON lb.node = e1.b
  WHERE la.lbl <> lb.lbl),
m3 AS MATERIALIZED (
  SELECT a AS node, least(a, min(b)) AS lbl FROM e2 GROUP BY a),
e3 AS MATERIALIZED (
  SELECT DISTINCT la.lbl AS a, lb.lbl AS b
  FROM e2 JOIN m3 la ON la.node = e2.a JOIN m3 lb ON lb.node = e2.b
  WHERE la.lbl <> lb.lbl),
rreach(node, r) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM e3)
  UNION
  SELECT rr.node, e.b FROM rreach rr JOIN e3 e ON e.a = rr.r),
rlbl AS (SELECT node, min(r) AS lbl FROM rreach GROUP BY node),
c2 AS (SELECT m1.node, coalesce(m2.lbl, m1.lbl) AS lbl
  FROM m1 LEFT JOIN m2 ON m2.node = m1.lbl),
c3 AS (SELECT c2.node, coalesce(m3.lbl, c2.lbl) AS lbl
  FROM c2 LEFT JOIN m3 ON m3.node = c2.lbl),
reach AS (SELECT c3.node AS node, coalesce(rl.lbl, c3.lbl) AS r
  FROM c3 LEFT JOIN rlbl rl ON rl.node = c3.lbl)
SELECT node, min(r) FROM reach GROUP BY node ORDER BY node
"""


def uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def check(name, edges):
    vals = ",".join(f"({a},{b})" for a, b in edges)
    sql = f"WITH RECURSIVE pairs(id_a, id_b) AS (VALUES {vals}),{CONTRACTION}"
    got = dict(duckdb.connect().execute(sql).fetchall())
    want = uf_components(edges)
    if got != want:
        bad = {k: (got.get(k), want[k]) for k in want if got.get(k) != want[k]}
        print(f"FAIL {name}: {bad}")
        return False
    print(f"PASS {name} ({len(set(want.values()))} components, {len(want)} nodes)")
    return True


def main(trials):
    ok = True
    ok &= check("path-500", [(i, i + 1) for i in range(1, 500)])
    ok &= check("reverse-path-500", [(i + 1, i) for i in range(1, 500)])
    ok &= check("star-200", [(1, i) for i in range(2, 200)])
    ok &= check("inverted-star", [(i, 200) for i in range(2, 200)])
    ok &= check("two-cliques",
                [(a, b) for a in range(1, 40) for b in range(a + 1, 40)]
                + [(a, b) for a in range(100, 140) for b in range(a + 1, 140)])
    ok &= check("binary-tree", [(i, 2 * i) for i in range(1, 128)]
                + [(i, 2 * i + 1) for i in range(1, 128)])
    random.seed(7)
    for t in range(trials):
        n = random.randint(2, 500)
        m = random.randint(1, 1200)
        edges = [(random.randint(1, n), random.randint(1, n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        if edges:
            ok &= check(f"rand-{t}", edges)
    print("OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 25))
