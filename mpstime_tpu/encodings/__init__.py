from .registry import (EncodingSpec, get_encoding, function_basis,
                       encoding_range)
from .pipeline import EncodedDataset, encode_dataset, encode_series
from . import bases

__all__ = [
    "EncodingSpec", "get_encoding", "function_basis", "encoding_range",
    "EncodedDataset", "encode_dataset", "encode_series", "bases",
]
