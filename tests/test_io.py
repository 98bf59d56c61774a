"""IO layer: column sanitizer (FIXTURES.md B5 branch table) + CSV reader."""

from __future__ import annotations

import pytest

from personal_data_lakehouse_spark.io.readers import read_csv
from personal_data_lakehouse_spark.io.sanitize import (
    sanitize_column_name,
    sanitize_columns,
)


@pytest.mark.parametrize(
    ("raw", "index", "expected"),
    [
        ("Data do Pregão", 0, "data_do_pregao"),  # NFKD fold + snake_case
        ("Unnamed: 3", 3, "coluna_extra_3"),  # pandas unnamed column
        ("%", 2, "coluna_sem_nome_2"),  # empty after cleaning
        ("12meses", 1, "num_12meses"),  # leading digit
        ("Preço (R$)", 0, "preco_r"),  # special-char strip
        ("Já_Normal", 0, "ja_normal"),
    ],
)
def test_sanitize_column_name(raw, index, expected):
    assert sanitize_column_name(raw, index) == expected


def test_sanitize_columns_dataframe(spark):
    df = spark.createDataFrame(
        [(1.0, "x", 2.0)], ["Data do Pregão", "Unnamed: 1", "12meses"]
    )
    out = sanitize_columns(df)
    assert out.columns == ["data_do_pregao", "coluna_extra_1", "num_12meses"]
    assert out.count() == 1


def test_read_csv_sanitized(spark, tmp_path):
    p = tmp_path / "ativos.csv"
    p.write_text("Data do Pregão,Preço (R$),12meses\n2024-01-01,10.5,0.9\n")
    df = read_csv(spark, str(p), sanitize=True)
    assert df.columns == ["data_do_pregao", "preco_r", "num_12meses"]
    row = df.collect()[0]
    assert row.preco_r == 10.5
