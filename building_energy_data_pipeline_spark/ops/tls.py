"""TLS certificate lifecycle for the engine's endpoints (C-surface
parity with the reference's ``CaManager``,
``src/ca_managing/ca_manager.py:1-296`` + ``tests/test_ca_manager.py``).

The reference generates self-signed certificates (an OpenSSL
subprocess path and a ``cryptography``-library path), validates them,
and toggles PostgreSQL's SSL stanza. This engine has no PostgreSQL —
its endpoints are Spark's (driver UI, history server, RPC), which
read ``spark.ssl.*`` from a properties file — so the config half
targets a spark-defaults-style file with the same enable/disable
round-trip semantics the reference applies to ``postgresql.conf``.
Everything here is driver-side infra (no Spark jobs).

Deviations from the reference, on purpose:
- the ``cryptography`` path is primary and the OpenSSL subprocess is
  the fallback (the reference prefers the subprocess) — no external
  binary needed in the common case;
- config editing is line-keyed and idempotent rather than substring
  replacement (the reference's ``content.replace`` left duplicate
  ``ssl_cert_file`` lines behind on repeated enables).
"""

from __future__ import annotations

import logging
import os
import subprocess
from datetime import datetime, timedelta, timezone

_LOG = logging.getLogger(__name__)

#: spark.ssl keys managed by configure_spark_ssl, in write order
_SSL_KEYS = ("spark.ssl.enabled", "spark.ssl.certFile", "spark.ssl.keyFile")


def generate_self_signed_cert(
    cert_path: str,
    key_path: str,
    common_name: str = "localhost",
    days: int = 365,
) -> None:
    """Write a self-signed RSA-2048/SHA-256 certificate + private key
    as PEM (the reference's ``generate_cert_with_cryptography``:
    CN-only subject==issuer, CA basic constraint, 365-day window,
    key chmod 0600)."""
    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, common_name)]
    )
    now = datetime.now(timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + timedelta(days=days))
        .add_extension(
            x509.BasicConstraints(ca=True, path_length=None), critical=True
        )
        .sign(key, hashes.SHA256())
    )
    with open(cert_path, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(key_path, "wb") as f:
        f.write(
            key.private_bytes(
                encoding=serialization.Encoding.PEM,
                format=serialization.PrivateFormat.TraditionalOpenSSL,
                encryption_algorithm=serialization.NoEncryption(),
            )
        )
    os.chmod(key_path, 0o600)
    _LOG.info("self-signed certificate written: %s, %s", cert_path, key_path)


def generate_cert_with_openssl(
    cert_path: str,
    key_path: str,
    common_name: str = "localhost",
    days: int = 365,
    openssl_path: str = "openssl",
) -> None:
    """OpenSSL-subprocess twin of :func:`generate_self_signed_cert`
    (the reference's ``generate_self_signed_cert``). Raises
    ``FileNotFoundError`` when the binary is absent and
    ``CalledProcessError`` on a failed invocation — the reference's
    documented error contract."""
    subprocess.run(
        [
            openssl_path, "req", "-new", "-x509", "-days", str(days),
            "-nodes", "-out", cert_path, "-keyout", key_path,
            "-subj", f"/CN={common_name}",
        ],
        check=True,
        capture_output=True,
    )
    os.chmod(key_path, 0o600)
    _LOG.info("self-signed certificate via openssl: %s, %s", cert_path, key_path)


def validate_certificate(
    cert_path: str, show_details: bool = False
) -> dict:
    """Parse and sanity-check a PEM certificate: well-formed, and the
    validity window contains now. Returns the detail dict the
    reference logs (subject CN, serial, not-before/after); raises on
    malformed input or an expired/not-yet-valid certificate."""
    from cryptography import x509
    from cryptography.x509.oid import NameOID

    with open(cert_path, "rb") as f:
        cert = x509.load_pem_x509_certificate(f.read())
    now = datetime.now(timezone.utc)
    if not (
        cert.not_valid_before_utc <= now <= cert.not_valid_after_utc
    ):
        raise ValueError(
            f"certificate {cert_path} outside validity window "
            f"[{cert.not_valid_before_utc}, {cert.not_valid_after_utc}]"
        )
    details = {
        "common_name": cert.subject.get_attributes_for_oid(
            NameOID.COMMON_NAME
        )[0].value,
        "serial_number": cert.serial_number,
        "not_valid_before": cert.not_valid_before_utc,
        "not_valid_after": cert.not_valid_after_utc,
    }
    if show_details:
        for k, v in details.items():
            _LOG.info("  %s: %s", k, v)
    _LOG.info("certificate %s is valid", cert_path)
    return details


def configure_spark_ssl(
    conf_path: str,
    cert_path: str,
    key_path: str,
    enable: bool = True,
) -> None:
    """Toggle the ``spark.ssl.*`` stanza in a spark-defaults-style
    properties file — the engine's analogue of the reference's
    ``configure_postgresql_ssl`` round trip on ``postgresql.conf``.
    Line-keyed and idempotent: repeated enables rewrite the same
    three lines, disable removes them and writes ``enabled false``;
    unrelated lines pass through untouched."""
    lines: list[str] = []
    if os.path.exists(conf_path):
        with open(conf_path) as f:
            lines = [
                ln
                for ln in f.read().splitlines()
                if not any(ln.startswith(k) for k in _SSL_KEYS)
            ]
    if enable:
        lines += [
            f"spark.ssl.enabled true",
            f"spark.ssl.certFile {cert_path}",
            f"spark.ssl.keyFile {key_path}",
        ]
    else:
        lines.append("spark.ssl.enabled false")
    with open(conf_path, "w") as f:
        f.write("\n".join(lines).strip() + "\n")
    _LOG.info(
        "spark SSL %s in %s", "enabled" if enable else "disabled", conf_path
    )
