"""Plan layer: archive layout, batch replay (cat) planning, validation."""

from go_triton_spark.plans.archive_store import ArchiveStore, list_dates_from_range

__all__ = ["ArchiveStore", "list_dates_from_range"]
