"""MySQL ``%``-pattern → Spark datetime-pattern translation.

Doris's ``date_format`` / ``str_to_date`` take MySQL format strings
(``%Y-%m-%d %H:%i:%s``); Spark's ``date_format`` / ``to_timestamp`` take
Java ``DateTimeFormatter`` patterns (``yyyy-MM-dd HH:mm:ss``). SURVEY.md
§2.5 names this translator as one of the two real dialect shims the
engine needs (upstream: ``be/src/vec/functions/function_datetime_*`` /
``date_format`` docs).

The translation is a pure driver-side string rewrite done once at plan
build — the resulting expression is a native JVM ``date_format`` /
``to_timestamp``, so the hot path stays in whole-stage codegen with zero
Python involvement per row (100 TB-safe by construction).
"""

from __future__ import annotations

#: MySQL specifier → Spark (java.time) pattern fragment.
#: Reference: MySQL 8.0 DATE_FORMAT docs; Spark "Datetime Patterns" docs.
_MYSQL_TO_SPARK = {
    "Y": "yyyy",  # 4-digit year
    "y": "yy",  # 2-digit year
    "m": "MM",  # month 01..12
    "c": "M",  # month 1..12
    "M": "MMMM",  # month name
    "b": "MMM",  # abbreviated month name
    "d": "dd",  # day 01..31
    "e": "d",  # day 1..31
    "H": "HH",  # hour 00..23
    "k": "H",  # hour 0..23
    "h": "hh",  # hour 01..12
    "I": "hh",  # hour 01..12
    "l": "h",  # hour 1..12
    "i": "mm",  # minutes
    "s": "ss",  # seconds
    "S": "ss",  # seconds (MySQL alias)
    "f": "SSSSSS",  # microseconds
    "p": "a",  # AM/PM
    "W": "EEEE",  # weekday name
    "a": "EEE",  # abbreviated weekday name
    "j": "DDD",  # day of year 001..366
    "T": "HH:mm:ss",
    "r": "hh:mm:ss a",
    "%": "%",  # literal percent (handled specially below)
}

#: Specifiers with no java.time pattern, but computable as expressions —
#: ``mysql_pattern_segments`` emits them as ("calc", spec) segments that
#: ``date_format`` (Column path) and the SQL front end compose with
#: concat. %v is the ISO week (MySQL mode 3), %x its week-year.
_COMPUTED = {
    "w",  # day of week 0=Sunday (java.time has no 0-based day number)
    "D",  # day with english suffix (1st, 2nd)
    "v",  # ISO week number (Monday-first, mode 3)
    "x",  # ISO week-year (pairs with %v)
    "U",  # week 00-53, Sunday-first, mode 0 (week 1 = first Sunday on)
    "u",  # week 00-53, Monday-first, mode 1 (week 1 = ≥4 days in year)
    "V",  # week 01-53, Sunday-first, mode 2 (week 0 → prev year's last)
    "X",  # year of the %V week
}

#: No specifiers are unsupported any more — the week modes 0/1/2 joined
#: the computed set in r6 (pure day-arithmetic expressions; see
#: functions._calc_spec_col). Kept as an (empty) set so the fail-loud
#: path stays exercised if a future spec lands here.
_UNSUPPORTED: set[str] = set()


def mysql_pattern_to_spark(fmt: str) -> str:
    """Translate a MySQL format string to a Spark datetime pattern.

    Literal text is single-quoted so letters pass through verbatim
    (``%Y年`` → ``yyyy'年'`` is unnecessary for CJK but required for
    ASCII letters, which java.time reserves).

    >>> mysql_pattern_to_spark("%Y-%m-%d %H:%i:%s")
    'yyyy-MM-dd HH:mm:ss'
    >>> mysql_pattern_to_spark("%d/%b/%Y")
    'dd/MMM/yyyy'
    """
    out: list[str] = []
    literal: list[str] = []

    def flush_literal() -> None:
        if not literal:
            return
        text = "".join(literal)
        if any(ch.isalpha() for ch in text):
            out.append("'" + text.replace("'", "''") + "'")
        else:
            out.append(text)
        literal.clear()

    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            spec = fmt[i + 1]
            if spec == "%":
                literal.append("%")
            elif spec in _MYSQL_TO_SPARK:
                flush_literal()
                out.append(_MYSQL_TO_SPARK[spec])
            elif spec in _COMPUTED:
                raise ValueError(
                    f"MySQL datetime specifier %{spec} needs expression "
                    f"composition — use mysql_pattern_segments / "
                    f"palo_spark.functions.date_format"
                )
            elif spec in _UNSUPPORTED:
                raise ValueError(
                    f"MySQL datetime specifier %{spec} has no faithful Spark "
                    f"equivalent (documented dialect gap)"
                )
            else:
                # MySQL treats unknown %x as literal x
                literal.append(spec)
            i += 2
        else:
            literal.append(ch)
            i += 1
    flush_literal()
    return "".join(out)


def mysql_pattern_segments(fmt: str) -> list[tuple[str, str]]:
    """Split a MySQL format string into composable segments:
    ``("pat", java_pattern)`` runs formattable by one ``date_format``
    call, and ``("calc", spec)`` for the computed specifiers
    (%w day-of-week-0, %D english suffix, %v ISO week, %x ISO
    week-year). A format with no computed specifiers yields a single
    ``("pat", ...)`` segment — callers keep the zero-concat fast path.
    """
    segs: list[tuple[str, str]] = []
    run: list[str] = []  # current raw-MySQL run (re-fed to the translator)
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%" and i + 1 < len(fmt):
            spec = fmt[i + 1]
            if spec in _COMPUTED:
                if run:
                    segs.append(("pat", mysql_pattern_to_spark("".join(run))))
                    run = []
                segs.append(("calc", spec))
            else:
                run.append(ch)
                run.append(spec)
            i += 2
        else:
            run.append(ch)
            i += 1
    if run or not segs:
        segs.append(("pat", mysql_pattern_to_spark("".join(run))))
    return segs
