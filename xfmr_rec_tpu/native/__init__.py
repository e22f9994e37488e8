"""Native (C++) runtime components, loaded via ctypes.

Build-on-first-import with g++; every native component has a pure-python
fallback, so the framework works without a toolchain (the import of
`tokenizer_native` simply fails and callers fall back).
"""
