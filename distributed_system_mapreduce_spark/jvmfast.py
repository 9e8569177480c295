"""py4j class/static-member handle cache — plan-construction fast path.

Guide §4 (the Python boundary) applies to plan CONSTRUCTION as much as to
row data: in PySpark classic mode every ``F.col`` / ``F.lit`` / ``col + 1``
resolves JVM handles through two uncached py4j reflection round trips —

- ``JVMView.__getattr__`` sends a ``REFL_GET_UNKNOWN`` command per class
  lookup (``sc._jvm.functions``, ``sc._jvm.PythonUtils``,
  ``getattr(sc._jvm, "org.apache.spark.sql.functions")`` in
  ``pyspark.sql.functions.builtin._get_jvm_function``), and the JVM side
  walks the view's import list with ``Class.forName`` attempts;
- ``JavaClass.__getattr__`` sends a ``REFL_GET_MEMBER`` command per static
  member lookup (``functions.col``, ``functions.lit``, …).

Measured on this host (Spark 4.1.2, local mode): a raw gateway round trip
is ~0.08 ms, but one ``F.col("x")`` costs ~1.5 ms and one ``col + 1``
~1.1 ms — the reflection commands dominate by >10x. Across the 237-query
registry one warm build sweep spends ~41 s (a third of the whole sf0.1
bench) purely constructing plans through this path.

Both lookups are semantically idempotent for the lifetime of a gateway:
a ``JavaClass`` names a class on a fixed classpath, and a static
``JavaMember`` / nested ``JavaClass`` is a stateless handle. (py4j itself
already caches instance members in ``JavaObject._methods`` — class-level
handles were simply never given the same treatment.) So this module
installs two tiny caches:

- per-``JVMView`` dict of resolved ``JavaClass`` / ``JavaPackage`` by name;
- per-``JavaClass`` dict of resolved static ``JavaMember`` / nested class
  by name.

Static FIELD reads are deliberately NOT cached (a field's value can
change); only handle types pass the ``isinstance`` filter. Caches live in
the instance ``__dict__`` of the view/class they describe, so a new
SparkContext (new gateway, new ``JVMView``) starts empty and dead handles
are garbage-collected with their owner. Dict access is GIL-atomic; a
concurrent miss costs one duplicate resolution, same as stock py4j's
``JavaObject._methods`` comment accepts.

Install is idempotent and happens at package import (``__init__``), so the
bench, the grading driver (which imports ``__spark_entry__``) and tests
all get it without touching session config. Results are unaffected — this
changes how fast Python finds ``org.apache.spark.sql.functions``, never
what the JVM computes.
"""

from __future__ import annotations

_INSTALLED = False


def install() -> None:
    """Idempotently wrap py4j's class-handle lookups with caches."""
    global _INSTALLED
    if _INSTALLED:
        return

    from py4j.java_gateway import JavaClass, JavaMember, JavaPackage, JVMView

    _orig_view_getattr = JVMView.__getattr__

    def _view_getattr(self, name):  # type: ignore[no-untyped-def]
        cache = self.__dict__.get("_dsmr_class_cache")
        if cache is None:
            cache = self.__dict__["_dsmr_class_cache"] = {}
        hit = cache.get(name)
        if hit is not None:
            return hit
        val = _orig_view_getattr(self, name)
        # only stable handle types; anything else (help shims, errors)
        # keeps stock behavior
        if isinstance(val, (JavaClass, JavaPackage)):
            cache[name] = val
        return val

    _orig_class_getattr = JavaClass.__getattr__

    def _class_getattr(self, name):  # type: ignore[no-untyped-def]
        cache = self.__dict__.get("_dsmr_member_cache")
        if cache is None:
            cache = self.__dict__["_dsmr_member_cache"] = {}
        hit = cache.get(name)
        if hit is not None:
            return hit
        val = _orig_class_getattr(self, name)
        # JavaMember (static method) and JavaClass (nested class) are
        # stateless handles; static field VALUES fall through uncached
        if isinstance(val, (JavaMember, JavaClass)):
            cache[name] = val
        return val

    JVMView.__getattr__ = _view_getattr
    JavaClass.__getattr__ = _class_getattr
    _INSTALLED = True
