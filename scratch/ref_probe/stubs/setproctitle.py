"""No-op setproctitle stand-in (cosmetic in the reference)."""

def setproctitle(title):
    pass
