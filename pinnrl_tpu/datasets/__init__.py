"""'The Well' dataset integration (reference: pinnrl/datasets/__init__.py:9-21)."""

from pinnrl_tpu.datasets.registry import (  # noqa: F401
    WELL_REGISTRY,
    WellEntry,
    get_entry,
    list_dataset_names,
)
from pinnrl_tpu.datasets.well_loader import (  # noqa: F401
    TheWellNotInstalledError,
    load_well_slice,
    resolve_path,
)
