"""The reference's two entry-point pipelines, recomposed on the engine
(SURVEY.md §3, §7 tier 6).

- Translation pipeline = ``/root/reference/translate.py:151-226``:
  load → clean → distinct text values → classify (T1) → detect (T2) →
  translate distinct (T3) → broadcast value-map apply (T5) → sink.
- Mapping pipeline = ``/root/reference/mapper.py:195-235``:
  clean → destination structure (P10) → LLM mapping (M1) → cleanup (M2)
  → vertical split (P9) → sink.

The reference's write-then-reload JSON checkpoint after every stage
(``translate.py:174-176`` etc.) is replaced by lazy composition; the
LLM-boundary artifacts (value dicts, mappings) — the things genuinely
worth persisting — still go through store_json_checkpoint when a
``checkpoint_dir`` is given.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.clean import preprocess_data
from ..operators.distinct import column_value_samples, string_columns
from ..operators.enrich import apply_value_maps, translate_distinct_values
from ..operators.mapping import clean_column_mapping, extract_table_structure, split_into_tables
from ..semantic.providers import (
    NON_ENGLISH,
    TEXT,
    SemanticProvider,
    classify_text_columns,
    detect_column_languages,
    propose_column_mapping,
)


def _checkpoint(payload, checkpoint_dir: str | None, name: str) -> None:
    if checkpoint_dir:
        from ..sources.writers import store_json_checkpoint

        store_json_checkpoint(payload, os.path.join(checkpoint_dir, name))


def run_translation_pipeline(
    df: DataFrame,
    provider: SemanticProvider,
    checkpoint_dir: str | None = None,
) -> tuple[DataFrame, dict]:
    """Stage 1: returns (translated_df, artifacts). Row count is
    preserved exactly; only TEXT ∩ NON-ENGLISH columns are translated
    (the reference's column-pruning, ``translate.py:184-204``)."""
    cleaned, log = preprocess_data(df)
    samples = {c: column_value_samples(cleaned, c, 10) for c in string_columns(cleaned)}
    labels = classify_text_columns(samples, provider)
    text_cols = [c for c, lab in labels.items() if lab == TEXT]
    langs = detect_column_languages({c: samples[c] for c in text_cols}, provider)
    target_cols = [c for c in text_cols if langs.get(c) == NON_ENGLISH]
    maps = translate_distinct_values(cleaned, target_cols, provider.translate_batch)
    _checkpoint(maps, checkpoint_dir, "translated-map.json")
    translated = apply_value_maps(cleaned, maps)
    artifacts = {
        "log": log,
        "column_labels": labels,
        "column_languages": langs,
        "translated_columns": target_cols,
        "value_maps": maps,
    }
    return translated, artifacts


def run_mapping_pipeline(
    df: DataFrame,
    destination_tables: dict[str, DataFrame],
    schema_description: str,
    provider: SemanticProvider,
    checkpoint_dir: str | None = None,
) -> tuple[dict[str, DataFrame], dict]:
    """Stage 2: returns ({table: DataFrame}, artifacts)."""
    cleaned, log = preprocess_data(df)  # idempotent re-clean, mapper.py:207
    structure = extract_table_structure(destination_tables)
    _checkpoint(structure, checkpoint_dir, "table-structure.json")
    samples = {c: column_value_samples(cleaned, c, 5) for c in cleaned.columns}
    raw_mapping = propose_column_mapping(schema_description, structure, samples, provider)
    _checkpoint(raw_mapping, checkpoint_dir, "raw-mapping.json")
    mapping = clean_column_mapping(raw_mapping)
    _checkpoint(mapping, checkpoint_dir, "clean-mapping.json")
    tables = split_into_tables(cleaned, mapping)
    return tables, {"log": log, "structure": structure, "mapping": mapping}
