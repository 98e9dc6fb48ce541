from .excepthook import install_excepthook

__all__ = ["install_excepthook"]
