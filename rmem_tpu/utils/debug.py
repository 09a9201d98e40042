"""Global debug print switch (aot_plus/networks/debug.py:1-5)."""

GLOBAL_IS_DEBUG = False


def debug(*args, **kwargs):
    if GLOBAL_IS_DEBUG:
        print(*args, **kwargs)
