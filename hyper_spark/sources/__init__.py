from hyper_spark.sources.tables import TESTDATA_TABLES, load_table, load_tables
from hyper_spark.sources.transcripts import transcripts_df, write_transcripts

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "transcripts_df",
    "write_transcripts",
]
