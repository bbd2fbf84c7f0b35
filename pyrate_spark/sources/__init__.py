"""Table-level sources/sinks: bucketed storage for co-located joins."""
