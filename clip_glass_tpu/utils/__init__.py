from clip_glass_tpu.utils.misc import (AttributeDict, bool_type, range_type,
                                       to_list)

__all__ = ["AttributeDict", "bool_type", "range_type", "to_list"]
