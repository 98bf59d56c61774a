"""The reference's two dbt models translated to Spark SQL (SURVEY §2/§3.3).

* ``daily_stocks``   — silver cleaning model (models/silver/daily_stocks.sql):
  typed/renamed projection, quality filter volume>0 AND close>0, intra-day
  variation with SAFE_DIVIDE null-on-zero, incremental on
  ``data_pregao >= MAX(target)``.
* ``monthly_summary`` — gold rollup (models/gold/monthly_stock_summary.sql):
  EXTRACT year/month + DATE_TRUNC month + SUM/AVG/MAX/MIN, unique_key
  ``(sigla_empresa, data_inicio_mes)``, incremental on the open month.

Dialect translations (SURVEY §7 "what's hard"):
BigQuery ``SAFE_DIVIDE(a,b)``     → ``CASE WHEN b <> 0 THEN a / b END``
BigQuery ``DATE_TRUNC(d, MONTH)`` → ``CAST(date_trunc('MONTH', d) AS DATE)``
"""

from __future__ import annotations

from personal_data_lakehouse_spark.plans.models import Model

DAILY_STOCKS = Model(
    name="daily_stocks",
    target="silver.daily_stocks",
    materialization="incremental",
    unique_key=["sigla_empresa", "data_pregao"],
    sql="""
    SELECT
        CAST(date AS DATE)                      AS data_pregao,
        upper(trim(ticker))                     AS sigla_empresa,
        CAST(open   AS DECIMAL(30,8))           AS valor_abertura,
        CAST(high   AS DECIMAL(30,8))           AS valor_maximo,
        CAST(low    AS DECIMAL(30,8))           AS valor_minimo,
        CAST(close  AS DECIMAL(30,8))           AS valor_fechamento,
        CAST(volume AS DECIMAL(30,8))           AS volume_negociado,
        CAST(close - open AS DECIMAL(30,8))     AS variacao_dia_abs,
        CASE WHEN open <> 0
             THEN (close - open) / open END     AS variacao_dia_perc,
        current_timestamp()                     AS data_ingestao_silver
    FROM {{ source('bronze', 'raw_stock_daily') }}
    WHERE volume > 0 AND close > 0
    {% if is_incremental() %}
      AND CAST(date AS DATE) >= (SELECT MAX(data_pregao) FROM {{ this }})
    {% endif %}
    """,
)

MONTHLY_SUMMARY = Model(
    name="monthly_summary",
    target="gold.monthly_summary",
    materialization="incremental",
    unique_key=["sigla_empresa", "data_inicio_mes"],
    sql="""
    SELECT
        sigla_empresa,
        CAST(EXTRACT(YEAR  FROM data_pregao) AS INT)      AS ano,
        CAST(EXTRACT(MONTH FROM data_pregao) AS INT)      AS mes,
        CAST(date_trunc('MONTH', data_pregao) AS DATE)    AS data_inicio_mes,
        SUM(volume_negociado)                             AS volume_total_mensal,
        AVG(valor_fechamento)                             AS preco_medio_fechamento_mensal,
        MAX(valor_maximo)                                 AS maximo_mensal,
        MIN(valor_minimo)                                 AS minimo_mensal
    FROM {{ ref('daily_stocks') }}
    {% if is_incremental() %}
      WHERE CAST(date_trunc('MONTH', data_pregao) AS DATE) >=
            (SELECT MAX(data_inicio_mes) FROM {{ this }})
    {% endif %}
    GROUP BY sigla_empresa, ano, mes, data_inicio_mes
    """,
)

REFERENCE_MODELS = [DAILY_STOCKS, MONTHLY_SUMMARY]
