"""kgpipe — a PySpark-native knowledge-graph construction pipeline.

Brand-new engine (not a port) reproducing the query/data-processing
capabilities of ikergarcia1996/Context-enriched-NER (see SURVEY.md) over
tables of multi-turn conversation transcripts
(conv_id, turn_idx, role, text, tool, ts).

Stages (reference analog in parentheses):
  1. mention detection   (TokenClassification/run_tokenclass.py)
  2. candidate generation + entity linking  (run_genre.py)
  3. KB enrichment / acceptance            (get_wikidata.py)
  4. classification + triple materialization (run_text_classification.py)

All stages are declarative DataFrame plans; sequence-local logic
(BIO parsing, tag rewriting) runs in Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
