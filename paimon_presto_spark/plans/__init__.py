"""Planning layer: predicate model, file skipping, partition pruning."""

from paimon_presto_spark.plans.predicate import P, Predicate

__all__ = ["P", "Predicate"]
