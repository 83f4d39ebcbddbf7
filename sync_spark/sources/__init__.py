"""Sources & sinks: normalized parquet/JSON/CSV readers, export
writers with the reference's quoting conventions, CDC event-log
source."""
