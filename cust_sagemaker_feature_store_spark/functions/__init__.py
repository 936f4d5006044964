from .casts import double_with_default, record_to_dict, row_to_record, to_wire_string
from .timeutil import format_iso_z, parse_iso_z, parse_loose_timestamp

__all__ = [
    "double_with_default", "record_to_dict", "row_to_record", "to_wire_string",
    "format_iso_z", "parse_iso_z", "parse_loose_timestamp",
]
