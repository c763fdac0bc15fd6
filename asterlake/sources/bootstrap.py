"""Object-store bootstrap: idempotent bucket creation (SURVEY §2.1 S7).

Re-expresses the reference's standalone boto3 script
(``src/create_bucket.py:28-35`` — create bucket, swallow
BucketAlreadyOwnedByYou/BucketAlreadyExists) as a library function wired to
the engine's existing :class:`~asterlake.session.ObjectStoreConfig` instead
of raw env vars. This is infra bootstrap, not a query operator: it runs
driver-side before any Spark job, exactly like the reference runs its
script before the DAG.

The S3 client is *injected* (any object with ``create_bucket(Bucket=...)``)
so the behavior is testable without boto3 or a network; ``make_client``
builds a real boto3 client from an ``ObjectStoreConfig`` when boto3 is
available (it is not shipped in every environment, hence the import-try).
"""

from __future__ import annotations

from typing import Any, Protocol

from asterlake.session import ObjectStoreConfig

#: error codes that mean "the bucket is already there" — success for an
#: idempotent ensure (same set the reference catches, create_bucket.py:32)
_ALREADY_EXISTS_CODES = frozenset({"BucketAlreadyOwnedByYou", "BucketAlreadyExists"})


class SupportsCreateBucket(Protocol):
    def create_bucket(self, *, Bucket: str) -> Any: ...  # noqa: N803


def _error_code(exc: Exception) -> str | None:
    """Error code from a botocore-shaped ClientError (``exc.response``),
    duck-typed so fakes and real ClientErrors both work."""
    response = getattr(exc, "response", None)
    if isinstance(response, dict):
        return response.get("Error", {}).get("Code")
    return None


def ensure_bucket(client: SupportsCreateBucket, bucket_name: str) -> bool:
    """Create ``bucket_name`` if absent; True = created, False = existed.

    Any failure other than the two already-exists codes re-raises — a
    misconfigured endpoint/credential error must not be silently treated
    as success (the reference re-raises identically).
    """
    try:
        client.create_bucket(Bucket=bucket_name)
        return True
    except Exception as exc:  # noqa: BLE001 — filtered by error code below
        if _error_code(exc) in _ALREADY_EXISTS_CODES:
            return False
        raise


def make_client(config: ObjectStoreConfig) -> SupportsCreateBucket:
    """Real boto3 S3 client from the engine's object-store config.

    Import-gated: boto3 is optional (absent in this container); tests use
    an injected fake and never touch this path.
    """
    try:
        import boto3
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise ImportError(
            "boto3 is required for make_client(); install it or inject a "
            "client into ensure_bucket() directly"
        ) from exc

    scheme = "https" if config.ssl_enabled else "http"
    endpoint = config.endpoint
    if "://" not in endpoint:
        endpoint = f"{scheme}://{endpoint}"
    return boto3.client(
        "s3",
        endpoint_url=endpoint,
        aws_access_key_id=config.access_key,
        aws_secret_access_key=config.secret_key,
    )
