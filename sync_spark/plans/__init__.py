"""Driver-side planning helpers: backup/export expansion, grouping,
date-suffix partition pruning."""
