from . import marts, staging

__all__ = ["staging", "marts"]
