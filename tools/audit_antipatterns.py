#!/usr/bin/env python
"""Registry-WIDE anti-pattern sweep — automates the per-round manual
audit: build every registered query's plan at a small SF and flag

- ``CartesianProduct`` / ``BroadcastNestedLoopJoin`` without a bounded
  side (any appearance is flagged; known-bounded 1-row broadcasts are
  listed in ALLOW below with the reason),
- row-at-a-time Python UDFs (``BatchEvalPython`` — the slow path this
  repo bans from data paths; Arrow ``ArrowEvalPython`` / mapInPandas
  stages are fine and NOT flagged),
- plan-size blowups (optimized-plan string > 1 MB — the loop-unrolling
  regression class: the r8 Hilbert fold was a 7 MB plan before the
  aggregate-fold rewrite),
- non-portable output leaf types (decimal/binary/map/float32/... at
  the registry boundary — the r9 hydro_double_mass DECIMAL(38,0)
  driver-hash split class; tests/test_output_types.py guards the
  first-50 window per-suite-run, this sweep covers all queries),
- ``Generate`` nodes whose generator argument is a large inline
  expression that appears more than once in the plan (the r12
  ``size(gen)+explode(gen)`` fused-projection pathology: the same
  expensive array expression evaluated per output row on both faces
  of a Generate boundary cost docs_crosssnap_containment 162 s before
  a human noticed — SCALE.md §r12; materialize the array in a child
  projection so the Generate consumes an attribute instead),
- ORACLE-side ``CAST(<data-dependent integer product> AS DOUBLE)``
  without a documented magnitude bound (the r13 HUGEINT→DOUBLE
  misrounding class, SCALE.md §r13/r14: DuckDB's conversion is not
  correctly rounded past 2^53; suppress with an inline
  ``/* int<2^53 */`` marker once the bound is audited, or convert
  via the hi/lo 2^40 split when the quantity genuinely exceeds it).

EAGER queries (driver-side loops / plan-time profiles) execute their
bounded actions while the plan is built — acceptable at the audit SF.

Usage: python tools/audit_antipatterns.py [sf_dir]
Prints one line per flagged query and a final JSON summary; exit 1 if
anything is flagged.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402
from hrfco_data_pipeline_spark.session import get_spark  # noqa: E402

# known-acceptable nested-loop broadcasts: a bounded (1-row or
# few-row) aggregate joined without an equi-key. Every entry needs a
# reason — an unexplained appearance elsewhere is a finding.
ALLOW_NESTED_LOOP = {
    # pattern: crossJoin(broadcast(1-row totals/thresholds frame))
    # appears wherever a global scalar parameterizes a per-row filter
}

MAX_PLAN_BYTES = 1_000_000

# Generator arguments shorter than this are cheap enough that a second
# evaluation elsewhere in the plan is noise, not a pathology (the r12
# incident's winnowing expression was tens of KB).
MIN_GEN_EXPR_CHARS = 120


def generate_duplication_flags(plan: str) -> list[str]:
    """Flag Generate nodes whose generator argument is a LARGE inline
    expression that also appears elsewhere in the plan — the
    ``size(gen)+explode(gen)`` fused-projection pathology (SCALE.md
    §r12): both sibling projections re-evaluate the expensive array
    expression per row. A generator over a bare attribute reference
    (``explode(fps#123)``) is the materialized-child fix and never
    flags."""
    import re

    # the two evaluations of the same expression carry different
    # expression/lambda-variable ids (x_1#4 vs x_1#5) — normalize ids
    # away so textual identity means structural identity
    plan = re.sub(r"#\d+", "#x", plan)
    gen_args: list[tuple[str, str]] = []  # (generator, arg)
    spans: list[tuple[int, int]] = []  # generator-arg char spans
    overflow_flags: list[str] = []
    for m in re.finditer(r"Generate (explode|posexplode|inline)\(", plan):
        start = m.end() - 1  # at the opening paren
        depth = 0
        end = start
        for i in range(start, min(len(plan), start + 200_000)):
            c = plan[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end == start:
            # the closing paren was not found within the scan cap —
            # the LARGEST instances of the very pathology this
            # detector exists for would otherwise be silently skipped
            # (ADVICE r13): surface an explicit audit flag instead.
            overflow_flags.append(
                f"generator-arg-too-large-to-audit:{m.group(1)}"
                f"@{m.start()}"
            )
            continue
        arg = plan[start + 1 : end]
        spans.append((start + 1, end))
        if len(arg) < MIN_GEN_EXPR_CHARS:
            continue
        if re.fullmatch(r"[A-Za-z_][A-Za-z_0-9 .]*#xL?", arg.strip()):
            continue  # attribute reference — evaluated once upstream
        gen_args.append((m.group(1), arg))
    # The same expression feeding SEVERAL Generate nodes (one per plan
    # branch, each evaluated once per branch row) is legitimate DAG
    # reuse — the pathology is an occurrence OUTSIDE every generator
    # argument (the fused sibling projection re-evaluating it per
    # exploded output row). An occurrence judged by POSITION: inside
    # any generator-arg span (two branches' args can differ by a
    # cast, making one a substring of the other) it is part of that
    # generator's single evaluation and benign.
    flags = list(overflow_flags)
    seen: set[str] = set()
    for gen, arg in gen_args:
        if arg in seen:
            continue
        seen.add(arg)
        n_outside = 0
        for mo in re.finditer(re.escape(arg), plan):
            s, e = mo.start(), mo.end()
            if not any(a <= s and e <= b for a, b in spans):
                n_outside += 1
        if n_outside:
            flags.append(
                f"generate-duplicated-expression:{gen}"
                f"({arg[:60]}...)x{n_outside}+gen"
            )
    return flags


def int_double_overflow_flags(sql: str) -> list[str]:
    """Flag ``CAST(<expr> AS DOUBLE)`` in ORACLE SQL where ``<expr>``
    multiplies data-dependent (non-literal) operands — the integer
    product/sum-of-products shape whose magnitude can pass 2^53, where
    DuckDB's HUGEINT→DOUBLE cast is NOT correctly rounded (SCALE.md
    §r13: measured one-ulp split on supplier_share_drift's first TV
    form; the bot-screen CV² had the same latent shape). The house
    rule is that every integer→double conversion stays under 2^53;
    a conversion whose bound is genuinely documented suppresses the
    flag with an inline ``/* int<2^53 */`` marker next to the cast.

    Heuristic, not a prover: multiplications of two numeric literals,
    ``count(*)``, decimal-context products (the %.2f-DECIMAL house
    path — DECIMAL→DOUBLE is correctly rounded in both engines), and
    marked casts do not flag."""
    import re

    flags: list[str] = []
    # strip SQL string literals so '%.2f' / '|' separators can't fake
    # or hide an operator, and line comments
    clean = re.sub(r"'[^']*'", "''", sql)
    clean = re.sub(r"--[^\n]*", "", clean)
    for m in re.finditer(r"CAST\s*\(", clean, re.IGNORECASE):
        start = m.end() - 1
        depth = 0
        end = None
        for i in range(start, len(clean)):
            c = clean[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        if end is None:
            continue
        arg = clean[start + 1 : end]
        if not re.search(r"AS\s+DOUBLE\s*$", arg.strip(), re.IGNORECASE):
            continue
        if "int<2^53" in arg:
            continue  # documented-bound suppression marker
        body = re.sub(r"AS\s+DOUBLE\s*$", "", arg.strip(), flags=re.IGNORECASE)
        # decimal-context conversions are exempt: the %.2f-DECIMAL
        # house path and explicit DECIMAL casts are correctly rounded
        if re.search(r"AS\s+DECIMAL", body, re.IGNORECASE):
            continue
        # the hi/lo exact-conversion idiom is exempt: a trailing
        # `% <literal>` bounds the casted part under the literal by
        # construction, and a trailing `// <literal>` bounds it under
        # 2^53 ONLY when the divisor is large (v // 2^40 for v < 2^93;
        # each part converts exactly, the power-of-two scale is exact,
        # and the single IEEE add correctly rounds; SCALE.md §r14).
        # `// 2` would leave the quotient unbounded, so the floordiv
        # exemption requires divisor >= 2^40 (ADVICE r14).
        if re.search(r"%\s*\d+\s*$", body.strip()):
            continue
        mdiv = re.search(r"//\s*(\d+)\s*$", body.strip())
        if mdiv and int(mdiv.group(1)) >= 2**40:
            continue
        probe = body.replace("count(*)", "count_rows").replace(
            "COUNT(*)", "count_rows"
        )
        # a multiplication between two non-literal operands?
        for mm in re.finditer(r"\*", probe):
            left = probe[: mm.start()].rstrip()
            right = probe[mm.end() :].lstrip()
            lt = re.search(r"([A-Za-z_0-9.()\[\]]+)$", left)
            rt = re.match(r"([A-Za-z_0-9.()\[\]]+)", right)
            if not lt or not rt:
                continue
            def _is_literal(tok: str) -> bool:
                return bool(re.fullmatch(r"[0-9.()\[\]]+", tok))
            if not _is_literal(lt.group(1)) and not _is_literal(rt.group(1)):
                flags.append(
                    "int-to-double-unbounded-product:"
                    + re.sub(r"\s+", " ", body)[:80]
                )
                break
    return flags


def _nonportable_leaves(dt, path):
    from pyspark.sql import types as T

    portable = (
        T.StringType, T.LongType, T.IntegerType, T.DoubleType,
        T.BooleanType, T.DateType, T.TimestampType, T.TimestampNTZType,
    )
    if isinstance(dt, T.ArrayType):
        yield from _nonportable_leaves(dt.elementType, path + "[]")
    elif isinstance(dt, T.StructType):
        for f in dt.fields:
            yield from _nonportable_leaves(f.dataType, f"{path}.{f.name}")
    elif not isinstance(dt, portable):
        yield f"{path}:{type(dt).__name__}"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="antipattern-audit")
    spark.sparkContext.setLogLevel("ERROR")

    findings: dict[str, list[str]] = {}
    n_nlj_allowed = 0
    oracles = entry_mod.oracle_sql()
    for name, fn in entry_mod.queries().items():
        for f in int_double_overflow_flags(oracles.get(name, "")):
            findings.setdefault(name, []).append(f)
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report, don't abort
            findings.setdefault(name, []).append(
                f"plan-build-error: {type(e).__name__}: {e}"
            )
            continue
        flags = []
        if "CartesianProduct" in plan:
            flags.append("cartesian-product")
        if "BroadcastNestedLoopJoin" in plan:
            if name in ALLOW_NESTED_LOOP:
                n_nlj_allowed += 1
            else:
                # crossJoin(broadcast(<bounded agg>)) plans as BNLJ —
                # acceptable ONLY when the broadcast side is an
                # aggregate (bounded rows by construction)
                import re

                bcast_sides = re.findall(
                    r"BroadcastNestedLoopJoin[^\n]*\n(?:.*\n){0,40}?"
                    r".*BroadcastExchange",
                    plan,
                )
                if "HashAggregate" not in plan.split(
                    "BroadcastNestedLoopJoin", 1
                )[1][:4000] and not bcast_sides:
                    flags.append("nested-loop-join")
        if "BatchEvalPython" in plan:
            flags.append("row-at-a-time-python-udf")
        flags.extend(generate_duplication_flags(plan))
        bad_types = [
            s
            for f in df.schema.fields
            for s in _nonportable_leaves(f.dataType, f.name)
        ]
        if bad_types:
            flags.append("non-portable-output-type:" + ",".join(bad_types))
        if len(plan) > MAX_PLAN_BYTES:
            flags.append(f"plan-size-{len(plan) // 1024}KB")
        if flags:
            findings[name] = flags

    for name, flags in sorted(findings.items()):
        print(f"FLAG {name}: {', '.join(flags)}")
    print(
        json.dumps(
            {
                "queries_audited": len(entry_mod.queries()),
                "flagged": len(findings),
                "findings": findings,
                "sf_dir": sf_dir,
            },
            separators=(",", ":"),
        )
    )
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
