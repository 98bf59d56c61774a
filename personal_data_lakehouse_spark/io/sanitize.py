"""Column-name sanitization — schema policy P8 (SURVEY.md §1.4/§2.2).

Reproduces the semantics of the reference's sanitizer
(pipelines/ativos_financeiro_csv/transformacao.py:38-67) exactly, branch
for branch:

1. pandas ``Unnamed``-prefixed columns   → ``coluna_extra_<i>``
2. NFKD accent-fold → ASCII, lowercase, spaces → underscores
3. strip everything outside ``[a-z0-9_]``
4. empty after cleaning (e.g. ``%``)     → ``coluna_sem_nome_<i>``
5. leading digit (warehouse-illegal)     → ``num_`` prefix

Runs driver-side on column *names* only (metadata, not data — zero
distributed cost at any scale).
"""

from __future__ import annotations

import re
import unicodedata

from pyspark.sql import DataFrame


def sanitize_column_name(name: str, index: int) -> str:
    if str(name).startswith("Unnamed"):
        return f"coluna_extra_{index}"
    folded = (
        unicodedata.normalize("NFKD", str(name))
        .encode("ASCII", "ignore")
        .decode("utf-8")
    )
    folded = folded.lower().replace(" ", "_")
    clean = re.sub(r"[^a-z0-9_]", "", folded)
    if not clean:
        return f"coluna_sem_nome_{index}"
    if clean[0].isdigit():
        return f"num_{clean}"
    return clean


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Rename every column through the sanitizer (projection by rename)."""
    return df.toDF(*[sanitize_column_name(c, i) for i, c in enumerate(df.columns)])
