#!/usr/bin/env python3
"""One-shot migration: rewrite every oracle-SQL `round(...) + 0.0` zero-sign
normalization to the fold-proof CASE form:

    round(X, k) + 0.0   ->   CASE WHEN round(X, k) = 0 THEN 0.0 ELSE round(X, k) END

Rationale (VERDICT r14 #1): `x + 0.0 -> x` is a standard arithmetic
simplification; a DuckDB build that applies it resurrects the -0.0 the
normalization exists to remove. CASE branches are not subject to
arithmetic rewrites; `-0.0 = 0` is true so the THEN branch returns a
literal +0.0. Semantics preserved for NaN (`NaN = 0` false -> ELSE) and
NULL (`NULL = 0` -> NULL-false -> ELSE -> NULL), identical to `+ 0.0`.
"""
import re, sys

FILES = [
    "src/main/scala/graft/operators/VectorQueries.scala",
    "src/main/scala/graft/operators/MultimodalQueries.scala",
    "src/main/scala/graft/operators/RelationalQueries.scala",
    "src/main/scala/graft/operators/TextQueries.scala",
]

PLUS = re.compile(r"\s*\+\s*0\.0")

def migrate(text):
    out = []
    i = 0
    n = 0
    while True:
        k = text.find("round(", i)
        if k < 0:
            out.append(text[i:])
            break
        # not part of a longer identifier (e.g. bround, my_round)
        if k > 0 and (text[k-1].isalnum() or text[k-1] in "_."):
            out.append(text[i:k+6]); i = k + 6; continue
        # balanced-paren scan from round's '('
        d = 0
        j = k + 5
        while j < len(text):
            c = text[j]
            if c == "(":
                d += 1
            elif c == ")":
                d -= 1
                if d == 0:
                    break
            j += 1
        if j >= len(text):
            out.append(text[i:]); break
        m = PLUS.match(text, j + 1)
        if not m:
            out.append(text[i:j+1]); i = j + 1; continue
        rnd = text[k:j+1]
        out.append(text[i:k])
        out.append(f"CASE WHEN {rnd} = 0 THEN 0.0 ELSE {rnd} END")
        i = m.end()
        n += 1
    return "".join(out), n

total = 0
for f in FILES:
    path = f"/root/repo/{f}"
    src = open(path).read()
    new, n = migrate(src)
    open(path, "w").write(new)
    print(f"{f}: {n} sites migrated")
    total += n
print(f"total: {total}")
