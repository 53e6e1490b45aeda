from .cleaning import (
    SENTINELS,
    clean_measure,
    initcap_trim,
    nullif_empty,
    regexp_extract_null,
    sentinels_to_null,
)
from .numeric import avg6, dsum

__all__ = [
    "SENTINELS",
    "clean_measure",
    "initcap_trim",
    "nullif_empty",
    "regexp_extract_null",
    "sentinels_to_null",
    "avg6",
    "dsum",
]
