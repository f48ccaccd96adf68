"""Alert message construction (reference AlertPublisher semantics).

Reference: hrfco-kafka-streams/.../processor/AlertPublisher.java:53-61.
Java's ``String.format("%.2f", (Double) null)`` formats the word "null"
and then applies the precision to it, yielding the string ``"nu"``
(verified against Java 17). We preserve that quirk explicitly with a
``coalesce`` instead of letting a null argument swallow the whole
formatted string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fmt_wl(water_level: Column) -> Column:
    """``%.2f`` of the water level; Java renders null as ``"nu"``."""
    return F.coalesce(
        F.format_string("%.2f", water_level),
        F.lit("nu"),
    )


def alert_message(
    code: Column, warning_level: Column, water_level: Column, is_anomaly: Column
) -> Column:
    """Korean alert text, anomaly vs. tiered-warning variants.

    - anomaly:  ``관측소 {code}에서 이상치 감지 (수위: {wl:.2f} m)``
    - else:     ``관측소 {code}에서 {level} 수위 경보 (수위: {wl:.2f} m)``
    """
    wl_txt = _fmt_wl(water_level)
    return F.when(
        is_anomaly,
        F.concat(F.lit("관측소 "), code, F.lit("에서 이상치 감지 (수위: "), wl_txt, F.lit(" m)")),
    ).otherwise(
        F.concat(
            F.lit("관측소 "),
            code,
            F.lit("에서 "),
            warning_level,
            F.lit(" 수위 경보 (수위: "),
            wl_txt,
            F.lit(" m)"),
        )
    )
