"""Output, observability and run-management utilities."""
