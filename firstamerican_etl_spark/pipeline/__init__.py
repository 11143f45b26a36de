"""Byte-faithful re-expression of the reference FA ETL pipeline
(fa-etl.py) as single lazy Spark plans per stage.

- schemas:  explicit StructTypes per raw file family (§1.3 — explicit
            beats inference at 100 TB)
- convert:  clean/rank transforms for Deed, Prop, TaxHist, ValHist
            (fa-etl.py:20-426) as pure DataFrame→DataFrame functions
- unify:    the 4-way left-join merge (fa-etl.py:429-483)
- run:      CLI orchestration (O1-O7, fa-etl.py:510-615), generalized
            to many files per family via unionByName (resolving the
            reference's ``#@TODO: generalize this to multiple files``)
"""
