"""Error codes — parity with SiteCrawlerErrorCodes.java:15-32."""

HTTP_PERMANENT_REDIRECT = 301
HTTP_TEMPORARY_REDIRECT = 302
HTTP_FORBIDDEN = 403
HTTP_NOT_FOUND = 404
HTTP_GONE = 410
HTTP_INTERNAL_SERVER_ERROR = 500
HTTP_GENERIC_ERROR = 900

PAGEOBJECT_COULD_NOT_BE_FOUND = 1000       # null page  (ProcessPage.java:160-164)
WEBRESPONSE_COULD_NOT_BE_FOUND = 1001      # null response (ProcessPage.java:167-171)
CONTENTSTRING_COULD_NOT_BE_FOUND = 1002    # null content (ProcessPage.java:173-179)

SOCKET_EXCEPTION = 2000                    # ProcessPage.java:317-323
SOCKET_EXCEPTION_CONNECTION_RESET = 2001
UNKNOWN_HOST_EXCEPTION = 3000              # ProcessPage.java:324-325

ALL_CODES = [
    301, 302, 403, 404, 410, 500, 900, 1000, 1001, 1002, 2000, 2001, 3000,
]


def is_redirect(status_code: int) -> bool:
    """ProcessPage.java:359-361 — 301/302 only."""
    return 300 < status_code < 303
