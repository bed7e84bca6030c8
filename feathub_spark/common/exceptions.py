"""Exception hierarchy for feathub_spark.

Mirrors the error surface of the reference engine
(/root/reference/python/feathub/common/exceptions.py) without copying it:
a single base error plus focused subclasses used by the DSL and planner.
"""


class FeathubError(Exception):
    """Base class for all engine errors."""


class ExpressionError(FeathubError):
    """Raised when a FeatHub expression fails to lex/parse/type-check."""


class TypeError_(FeathubError):
    """Raised on invalid or unsupported dtype usage."""


class PlanError(FeathubError):
    """Raised when a descriptor tree cannot be compiled to a Spark plan."""


class RegistryError(FeathubError):
    """Raised on unresolved table/feature references."""
