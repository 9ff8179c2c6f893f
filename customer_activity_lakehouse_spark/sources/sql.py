"""SQL front-end for the snapshot log — ``snapshot.`/path``` table refs.

Spark's SQL engine cannot address snapshot-log tables (CREATE TABLE ...
USING snapshot_log stores OPTIONS the Python DataSource never receives
back — datasource.py:28), so DML/utility statements against the log had
to be spelled as Python calls. This module closes that usability gap the
same way Delta does with ``delta.`/path``` references: one entry point,

    run_table_sql(spark, "DELETE FROM snapshot.`/data/t` WHERE id < 100")

parses the statement shape and routes to the native verbs
(:mod:`snapshots`), so a SQL-speaking user drives the whole table layer
without learning the Python API. SELECTs rewrite every snapshot ref to a
registered temp view (honoring VERSION AS OF / TIMESTAMP AS OF) and hand
the rest of the statement to Spark SQL unchanged — Catalyst sees a plain
view over the snapshot read, so pruning/pushdown behave exactly as
:func:`snapshots.read_snapshot`.

GRAMMAR (case-insensitive keywords; anything unmatched fails loudly —
a mis-parsed DML that silently no-ops is a data-loss bug):

- SELECT ... snapshot.`p` [VERSION AS OF n | TIMESTAMP AS OF 'ts'] ...
- INSERT INTO snapshot.`p` <select>  /  INSERT OVERWRITE snapshot.`p` <select>
- DELETE FROM snapshot.`p` WHERE <cond>
- UPDATE snapshot.`p` SET a = <expr>[, b = <expr>] WHERE <cond>
- MERGE INTO snapshot.`p` [AS] t USING <view|snapshot.`p2`> [AS] s
    ON t.<k> = s.<k> [AND t.<k2> = s.<k2>]
    [WHEN MATCHED [AND <cond>] THEN DELETE]
    [WHEN MATCHED [AND <cond>] THEN UPDATE SET *]
    [WHEN NOT MATCHED [AND <cond>] THEN INSERT *]
  (whole-row semantics — the log's merge contract; conditions use the
  same s./t. qualifiers as :func:`snapshots.merge_snapshot`)
- OPTIMIZE snapshot.`p` [WHERE <col> BETWEEN <lo> AND <hi>]
    [ZORDER BY (a[, b...])]
- REORG TABLE snapshot.`p` APPLY (PURGE)
- VACUUM snapshot.`p` [RETAIN <n> HOURS]
- RESTORE snapshot.`p` TO VERSION AS OF <n>
- DESCRIBE HISTORY|DETAIL snapshot.`p`
- ALTER TABLE snapshot.`p` RENAME COLUMN a TO b
                         | DROP COLUMN a
                         | ADD CONSTRAINT name CHECK (<expr>)
                         | DROP CONSTRAINT name

Reference scope note: the reference delegates all querying to external
SQL engines (ReadMe.md:85-94) — this front-end is what makes the
snapshot log addressable from that SQL surface.
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from . import snapshots as S

_REF = r"snapshot\.`([^`]+)`"
_TRAVEL = (
    r"(?:\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?"
)


def _one_ref(stmt: str, ctx: str) -> str:
    refs = re.findall(_REF, stmt)
    if len(refs) != 1:
        raise ValueError(f"{ctx}: expected exactly one snapshot.`path` ref, got {refs}")
    return refs[0]


def run_table_sql(spark: SparkSession, stmt: str) -> DataFrame | int | None:
    """Execute one statement. Returns a DataFrame for SELECT/DESCRIBE,
    the committed version (int) for DML/utility verbs, the deleted-file
    count for VACUUM, or None for a no-op OPTIMIZE/REORG."""
    s = stmt.strip().rstrip(";")
    head = s.split(None, 1)[0].upper() if s else ""
    if head in ("SELECT", "WITH"):
        return _select(spark, s)
    if head == "INSERT":
        return _insert(spark, s)
    if head == "DELETE":
        return _delete(spark, s)
    if head == "UPDATE":
        return _update(spark, s)
    if head == "MERGE":
        return _merge(spark, s)
    if head == "OPTIMIZE":
        return _optimize(spark, s)
    if head == "REORG":
        m = re.fullmatch(
            rf"REORG\s+TABLE\s+{_REF}\s+APPLY\s*\(\s*PURGE\s*\)", s, re.I
        )
        if not m:
            raise ValueError(f"cannot parse REORG statement: {stmt!r}")
        return S.reorg_snapshot(spark, m.group(1))
    if head == "VACUUM":
        m = re.fullmatch(rf"VACUUM\s+{_REF}(?:\s+RETAIN\s+(\d+)\s+HOURS?)?", s, re.I)
        if not m:
            raise ValueError(f"cannot parse VACUUM statement: {stmt!r}")
        if m.group(2) is not None:
            return S.vacuum(spark, m.group(1), older_than_hours=float(m.group(2)))
        return S.vacuum(spark, m.group(1))
    if head == "RESTORE":
        m = re.fullmatch(
            rf"RESTORE\s+(?:TABLE\s+)?{_REF}\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)", s, re.I
        )
        if not m:
            raise ValueError(f"cannot parse RESTORE statement: {stmt!r}")
        return S.restore_snapshot(spark, m.group(1), int(m.group(2)))
    if head == "DESCRIBE":
        m = re.fullmatch(rf"DESCRIBE\s+(HISTORY|DETAIL)\s+{_REF}", s, re.I)
        if not m:
            raise ValueError(f"cannot parse DESCRIBE statement: {stmt!r}")
        fn = S.snapshot_history if m.group(1).upper() == "HISTORY" else S.snapshot_detail
        return fn(spark, m.group(2))
    if head == "ALTER":
        return _alter(spark, s)
    raise ValueError(f"unsupported statement (see module grammar): {stmt!r}")


def _select(spark: SparkSession, s: str) -> DataFrame:
    def _sub(m: re.Match) -> str:
        path, ver, ts = m.group(1), m.group(2), m.group(3)
        view = f"__snap_{uuid.uuid4().hex[:10]}"
        if ts is not None:
            ver = S.version_at_timestamp(spark, path, ts)
        df = S.read_snapshot(spark, path, version=int(ver) if ver is not None else None)
        df.createOrReplaceTempView(view)
        return view

    rewritten, n = re.subn(_REF + _TRAVEL, _sub, s, flags=re.I)
    if not n:
        raise ValueError(f"SELECT has no snapshot.`path` reference: {s!r}")
    return spark.sql(rewritten)


def _insert(spark: SparkSession, s: str) -> int:
    m = re.match(
        rf"INSERT\s+(INTO|OVERWRITE)\s+{_REF}\s+(SELECT\b.*|WITH\b.*|TABLE\b.*|VALUES\b.*)",
        s,
        re.I | re.S,
    )
    if not m:
        raise ValueError(f"cannot parse INSERT statement: {s!r}")
    mode, path, body = m.group(1).upper(), m.group(2), m.group(3)
    # the payload may itself read snapshot refs
    df = _select(spark, body) if re.search(_REF, body) else spark.sql(body)
    if mode == "OVERWRITE":
        return S.commit_overwrite(spark, path, df)
    return S.commit_append(spark, path, df)


def _delete(spark: SparkSession, s: str) -> int:
    m = re.fullmatch(rf"DELETE\s+FROM\s+{_REF}\s+WHERE\s+(.+)", s, re.I | re.S)
    if not m:
        raise ValueError(f"cannot parse DELETE statement (WHERE is required): {s!r}")
    return S.delete_snapshot(spark, m.group(1), m.group(2).strip())


def _update(spark: SparkSession, s: str) -> int:
    m = re.fullmatch(
        rf"UPDATE\s+{_REF}\s+SET\s+(.+?)\s+WHERE\s+(.+)", s, re.I | re.S
    )
    if not m:
        raise ValueError(f"cannot parse UPDATE statement (WHERE is required): {s!r}")
    path, set_part, where = m.group(1), m.group(2), m.group(3).strip()
    set_exprs: dict[str, str] = {}
    # split on top-level commas only (expressions may contain f(a, b))
    depth, buf, parts = 0, [], []
    for ch in set_part:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    for p in parts:
        am = re.fullmatch(r"\s*(\w+)\s*=\s*(.+?)\s*", p, re.S)
        if not am:
            raise ValueError(f"cannot parse SET assignment: {p!r}")
        set_exprs[am.group(1)] = am.group(2)
    return S.update_snapshot(spark, path, where, set_exprs)


def _merge(spark: SparkSession, s: str) -> int:
    m = re.match(
        rf"MERGE\s+INTO\s+{_REF}\s*(?:AS\s+)?(\w+)?\s+"
        rf"USING\s+({_REF.replace('(', '(?:').replace(')', ')')}|\w+)\s*(?:AS\s+)?(\w+)?\s+"
        r"ON\s+(.+?)\s+(WHEN\s+.+)",
        s,
        re.I | re.S,
    )
    if not m:
        raise ValueError(f"cannot parse MERGE statement: {s!r}")
    path, t_alias, src, s_alias, on, clauses_part = (
        m.group(1),
        m.group(2) or "t",
        m.group(3),
        m.group(4) or "s",
        m.group(5),
        m.group(6),
    )
    src_ref = re.fullmatch(_REF, src)
    updates = (
        S.read_snapshot(spark, src_ref.group(1)) if src_ref else spark.table(src)
    )
    # ON must be a conjunction of alias-qualified key equalities
    keys: list[str] = []
    for eq in re.split(r"\s+AND\s+", on.strip(), flags=re.I):
        em = re.fullmatch(
            rf"\s*(?:{t_alias}|{s_alias})\.(\w+)\s*=\s*(?:{t_alias}|{s_alias})\.(\w+)\s*",
            eq,
        )
        if not em or em.group(1) != em.group(2):
            raise ValueError(
                f"MERGE ON must be AND-ed same-name key equalities "
                f"({t_alias}.k = {s_alias}.k): {eq!r}"
            )
        keys.append(em.group(1))

    def _norm_cond(cond: str | None) -> str | None:
        if cond is None:
            return None
        # the engine's clause contract uses literal s./t. qualifiers
        cond = re.sub(rf"\b{t_alias}\.", "t.", cond)
        return re.sub(rf"\b{s_alias}\.", "s.", cond)

    wm_delete = wm_update = wnm_insert = None
    clause_re = re.compile(
        r"WHEN\s+(NOT\s+)?MATCHED(?:\s+AND\s+(.+?))?\s+THEN\s+"
        r"(DELETE|UPDATE\s+SET\s+\*|INSERT\s+\*)\s*",
        re.I | re.S,
    )
    pos = 0
    seen = []
    for cm in clause_re.finditer(clauses_part):
        if cm.start() != pos:
            raise ValueError(
                f"unparsed MERGE clause text: {clauses_part[pos:cm.start()]!r}"
            )
        pos = cm.end()
        not_matched = bool(cm.group(1))
        cond = _norm_cond(cm.group(2))
        action = re.sub(r"\s+", " ", cm.group(3).upper())
        seen.append((not_matched, cond, action))
    if pos != len(clauses_part.rstrip()) and clauses_part[pos:].strip():
        raise ValueError(f"unparsed MERGE clause text: {clauses_part[pos:]!r}")
    have_update = False
    for not_matched, cond, action in seen:
        if not_matched:
            if action != "INSERT *":
                raise ValueError("WHEN NOT MATCHED supports only INSERT *")
            wnm_insert = cond or "true"
        elif action == "DELETE":
            wm_delete = cond or "true"
        else:
            have_update = True
            if cond is not None:
                wm_update = cond
    if not any(nm for nm, _, _ in seen) :
        # no insert clause: suppress inserts entirely
        wnm_insert = "false"
    if not have_update and wm_delete is None:
        raise ValueError("MERGE needs at least one WHEN clause")
    if not have_update:
        # delete-only merge: matched rows not covered by the delete
        # condition keep the target row (update nothing)
        wm_update = "false"
    return S.merge_snapshot(
        spark,
        path,
        updates,
        keys=keys,
        when_matched_update=wm_update,
        when_matched_delete=wm_delete,
        when_not_matched_insert=wnm_insert,
    )


def _optimize(spark: SparkSession, s: str) -> int | None:
    m = re.fullmatch(
        rf"OPTIMIZE\s+{_REF}"
        r"(?:\s+WHERE\s+(\w+)\s+BETWEEN\s+('[^']*'|\S+)\s+AND\s+('[^']*'|\S+))?"
        r"(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?",
        s,
        re.I,
    )
    if not m:
        raise ValueError(f"cannot parse OPTIMIZE statement: {s!r}")
    path, col, lo, hi, zcols = m.groups()

    def _lit(v: str | None):
        if v is None:
            return None
        if v.startswith("'"):
            return v.strip("'")
        try:
            return int(v)
        except ValueError:
            return float(v)

    kwargs: dict = {}
    if col is not None:
        kwargs["scope_where"] = (col, _lit(lo), _lit(hi))
    if zcols is not None:
        cols = [c.strip() for c in zcols.split(",")]
        kwargs["cluster_by"] = cols
        if len(cols) >= 2:
            kwargs["zorder"] = True
    return S.compact_snapshot(spark, path, **kwargs)


def _alter(spark: SparkSession, s: str) -> int:
    m = re.fullmatch(rf"ALTER\s+TABLE\s+{_REF}\s+(.+)", s, re.I | re.S)
    if not m:
        raise ValueError(f"cannot parse ALTER statement: {s!r}")
    path, rest = m.group(1), m.group(2).strip()
    rm = re.fullmatch(r"RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)", rest, re.I)
    if rm:
        return S.rename_snapshot_column(spark, path, rm.group(1), rm.group(2))
    dm = re.fullmatch(r"DROP\s+COLUMN\s+(\w+)", rest, re.I)
    if dm:
        return S.drop_snapshot_column(spark, path, dm.group(1))
    am = re.fullmatch(
        r"ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)", rest, re.I | re.S
    )
    if am:
        return S.set_check_constraint(spark, path, am.group(1), am.group(2))
    xm = re.fullmatch(r"DROP\s+CONSTRAINT\s+(\w+)", rest, re.I)
    if xm:
        return S.drop_check_constraint(spark, path, xm.group(1))
    raise ValueError(f"unsupported ALTER TABLE action: {rest!r}")
