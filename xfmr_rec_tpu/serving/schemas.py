"""Serving request/response schemas + golden examples.

API parity with the reference BentoML schemas
(/root/reference/xfmr_rec/bentoml/service.py:25-68): Activity, UserQuery,
ItemQuery, Query (text + optional embedding), ItemCandidate, and the
golden example item/user used by the integration tests.
"""

from __future__ import annotations

import pydantic


class Activity(pydantic.BaseModel):
    datetime: int
    rating: int
    movie_rn: int
    movie_id: int
    movie_text: str


class UserQuery(pydantic.BaseModel):
    user_rn: int = 0
    user_id: int = 0
    user_text: str = ""
    history: list[Activity] | None = None
    target: list[Activity] | None = None


class ItemQuery(pydantic.BaseModel):
    movie_rn: int = 0
    movie_id: int = 0
    movie_text: str = ""


class Query(pydantic.BaseModel):
    text: str = ""
    embedding: list[float] | None = None


class ItemCandidate(pydantic.BaseModel):
    movie_id: int
    movie_text: str
    score: float


class NotFoundError(LookupError):
    """Raised for unknown ids; the HTTP layer maps it to 404."""


# Golden examples (synthetic-corpus shapes; tests fill real values from the
# trained artifact's own stores, asserting id->row consistency).
EXAMPLE_ITEM_ID = 1
EXAMPLE_USER_ID = 1
