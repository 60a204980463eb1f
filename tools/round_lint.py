"""Rounding-discipline lint over every registered oracle (VERDICT r11 #5).

The registry's round-11 lesson: Spark's ``F.round`` rounds the double's
shortest decimal repr while DuckDB's ``ROUND`` rounds the binary value,
so a float OUTPUT column rounded with plain ``ROUND`` in the oracle can
hash-diverge on exact-halfway quotients (``functions/numeric.py:
spark_round_sql`` is the emulation both sides of that boundary must
use). Plain ``ROUND`` remains fine for integer micro-unit quantization
(``CAST(ROUND(x * 1e6) AS BIGINT)`` — the result leaves float space
entirely, so repr-vs-binary rounding cannot surface in the hash).

This lint makes that distinction machine-enforced instead of
reviewer-remembered. Every ``ROUND(`` occurrence in every oracle
(in-window AND retired) must be one of:

1. the ``spark_round_sql`` emulation —
   ``CAST(ROUND(CAST(CAST((expr) AS VARCHAR) AS DECIMAL(38,15)), d)
   AS DOUBLE)``; or
2. an integer quantization — ``CAST(ROUND(...) AS BIGINT/INT/...)``.

Anything else (a bare ``ROUND`` or a ``ROUND`` cast back to a float
type without the repr-emulation inner casts) is a new un-emulated
rounded float boundary and fails the lint. Run standalone
(``python tools/round_lint.py``) or via ``tests/test_signed_zero.py``.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

_INT_TYPES = r"(?:BIGINT|HUGEINT|INTEGER|INT|SMALLINT|TINYINT|UBIGINT|UINTEGER)"
_ROUND_OPEN = re.compile(r"\bROUND\s*\(", flags=re.I)
_CAST_BEFORE = re.compile(r"CAST\s*\(\s*$", flags=re.I)
_INT_AFTER = re.compile(rf"^\s*AS\s+{_INT_TYPES}\s*\)", flags=re.I)
_INT_POSTFIX = re.compile(rf"^\s*::\s*{_INT_TYPES}\b", flags=re.I)
_DOUBLE_AFTER = re.compile(r"^\s*AS\s+(?:DOUBLE|FLOAT|REAL)\s*\)", flags=re.I)
# spark_round_sql's inner argument: CAST(CAST((expr) AS VARCHAR) AS
# DECIMAL(38,15)), digits — matched on the normalized prefix.
_EMUL_INNER = re.compile(
    r"^CAST\s*\(\s*CAST\s*\(\s*\(", flags=re.I
)
_EMUL_DECIMAL = re.compile(r"AS\s+DECIMAL\s*\(\s*38\s*,\s*15\s*\)\s*\)\s*,", flags=re.I)


def _blank_literals(sql: str) -> str:
    """Replace the CONTENTS of single-quoted literals, ``--`` line
    comments, and ``/* */`` block comments with spaces, preserving every
    offset, so the ROUND scan never fires on quoted text (ADVICE r12).
    SQL's '' escape inside a literal is handled; an unterminated literal
    is blanked to end-of-string (fail-safe: nothing hidden)."""
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            if j < n:
                out.append("'" + " " * (j - i - 1) + "'")
                i = j + 1
            else:
                out.append("'" + " " * (n - i - 1))
                i = n
        elif sql.startswith("--", i):
            j = sql.find("\n", i)
            j = n if j == -1 else j
            out.append(" " * (j - i))
            i = j
        elif sql.startswith("/*", i):
            j = sql.find("*/", i)
            j = n if j == -1 else j + 2
            out.append(" " * (j - i))
            i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _balanced_close(sql: str, open_paren: int) -> int:
    """Index just past the ')' matching the '(' at ``open_paren``."""
    depth = 0
    for i in range(open_paren, len(sql)):
        if sql[i] == "(":
            depth += 1
        elif sql[i] == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parentheses")


def lint_sql(name: str, sql: str) -> list[str]:
    """Return one violation string per un-emulated rounded float
    boundary in ``sql`` (empty list = clean).

    Both ADVICE-r12 false-positive classes are handled rather than
    conventioned away: string-literal/comment contents are blanked
    before the scan (``_blank_literals`` — offset-preserving, so
    snippets still line up), and the integer-quantization allowance
    accepts DuckDB's postfix ``ROUND(...)::BIGINT`` alongside
    ``CAST(... AS BIGINT)``. Any remaining misfire still FAILS LOUDLY
    (never passes a real violation)."""
    problems = []
    sql = _blank_literals(sql)
    for m in _ROUND_OPEN.finditer(sql):
        arg_open = sql.index("(", m.start())
        arg_close = _balanced_close(sql, arg_open)
        inner = sql[arg_open + 1 : arg_close - 1].strip()
        before = sql[: m.start()]
        after = sql[arg_close:]
        wrapped_in_cast = bool(_CAST_BEFORE.search(before))
        if wrapped_in_cast and _INT_AFTER.match(after):
            continue  # integer micro-unit quantization — fine
        if _INT_POSTFIX.match(after):
            continue  # same quantization, DuckDB postfix-cast spelling
        if (
            wrapped_in_cast
            and _DOUBLE_AFTER.match(after)
            and _EMUL_INNER.match(inner)
            and _EMUL_DECIMAL.search(inner)
        ):
            continue  # the spark_round_sql emulation — fine
        snippet = " ".join(sql[max(0, m.start() - 40) : arg_close + 20].split())
        problems.append(
            f"{name}: plain ROUND on a float boundary — use "
            f"functions.numeric.spark_round_sql (or CAST … AS BIGINT for "
            f"integer quantization): …{snippet}…"
        )
    return problems


def lint_registry() -> list[str]:
    import weather_bigquery_lakehouse_spark.plans as P

    problems: list[str] = []
    for name, spec in sorted(P.ALL_QUERIES.items()):
        if spec.oracle:
            problems.extend(lint_sql(name, spec.oracle))
    return problems


if __name__ == "__main__":
    probs = lint_registry()
    for p in probs:
        print("FAIL", p)
    if not probs:
        import weather_bigquery_lakehouse_spark.plans as P

        print(f"OK {len(P.ALL_QUERIES)} oracles round-lint clean")
    sys.exit(1 if probs else 0)
