from .parsing import (
    format_alert,
    parse_alert,
    parse_timer,
    parse_update,
    protocol_classifier,
)

__all__ = [
    "protocol_classifier",
    "parse_alert",
    "format_alert",
    "parse_update",
    "parse_timer",
]
