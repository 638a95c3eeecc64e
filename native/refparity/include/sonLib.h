/* Minimal sonLib-compatible shim so the reference pairwise engine
 * (/root/reference/impl/pairwiseAligner.c, stateMachine.c) compiles
 * UNMODIFIED for the C-parity harness (tests/test_ref_parity.py).
 *
 * This is NOT sonLib: it implements only the symbols those two
 * translation units touch, with the semantics they rely on
 * (stList_sort comparators receive elements, stIntTuple is an
 * int64 vector, st_errAbort exits).  Written from the call sites,
 * not copied from sonLib.
 */
#ifndef CPECAN_TPU_SONLIB_SHIM_H
#define CPECAN_TPU_SONLIB_SHIM_H

#include <assert.h>
#include <inttypes.h>
#include <stdarg.h>
#include <stdbool.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#ifdef __cplusplus
extern "C" {
#endif

/* commonC.h constants the reference leans on */
#ifndef TRUE
#define TRUE 1
#endif
#ifndef FALSE
#define FALSE 0
#endif
#define LOG_ONE 0.0

/* ---- lists ---- */
typedef struct _stList {
    void **list;
    int64_t length;
    int64_t capacity;
    void (*destructFn)(void *);
} stList;

stList *stList_construct(void);
stList *stList_construct3(int64_t size, void (*destructFn)(void *));
int64_t stList_length(stList *l);
void *stList_get(stList *l, int64_t i);
void stList_set(stList *l, int64_t i, void *v);
void stList_append(stList *l, void *v);
void stList_appendAll(stList *l, stList *other);
void *stList_pop(stList *l);
void stList_reverse(stList *l);
void stList_sort(stList *l, int (*cmp)(const void *, const void *));
void stList_setDestructor(stList *l, void (*destructFn)(void *));
void stList_destruct(stList *l);

/* ---- int tuples ---- */
typedef struct _stIntTuple {
    int64_t length;
    int64_t vals[];
} stIntTuple;

stIntTuple *stIntTuple_construct2(int64_t a, int64_t b);
stIntTuple *stIntTuple_construct3(int64_t a, int64_t b, int64_t c);
stIntTuple *stIntTuple_construct4(int64_t a, int64_t b, int64_t c, int64_t d);
int64_t stIntTuple_get(stIntTuple *t, int64_t i);
int64_t stIntTuple_length(stIntTuple *t);
void stIntTuple_destruct(stIntTuple *t);
int stIntTuple_cmpFn(stIntTuple *a, stIntTuple *b);

/* ---- sorted set (array-backed; fine at anchor-list scale) ---- */
typedef struct _stSortedSet stSortedSet;
stSortedSet *stSortedSet_construct3(int (*cmp)(const void *, const void *),
                                    void (*destructFn)(void *));
void stSortedSet_insert(stSortedSet *s, void *v);
void *stSortedSet_search(stSortedSet *s, void *v);
void stSortedSet_destruct(stSortedSet *s);

/* ---- strings ---- */
char *stString_copy(const char *s);
char *stString_print(const char *fmt, ...);
char *stString_getSubString(const char *s, int64_t start, int64_t length);
char *stString_replace(const char *s, const char *from, const char *to);
stList *stString_split(const char *s);
char *stFile_getLineFromFile(FILE *f);

/* ---- misc runtime ---- */
void *st_malloc(size_t n);
void *st_calloc(int64_t num, size_t size);
void st_errAbort(const char *fmt, ...) __attribute__((noreturn));
void st_errnoAbort(const char *fmt, ...) __attribute__((noreturn));
void st_logDebug(const char *fmt, ...);
void st_logInfo(const char *fmt, ...);
int64_t st_system(const char *fmt, ...);
void stThrowNew(const char *exceptionId, const char *fmt, ...) __attribute__((noreturn));
double st_random(void);
int64_t st_randomInt(int64_t min, int64_t max);

/* ---- jsmn/JSON surface (abort stubs: parity harness never parses JSON) ---- */
typedef struct {
    int type;
    int start;
    int end;
    int size;
} jsmntok_t;

int64_t stJson_setupParser(char *buf, size_t r, jsmntok_t **tokens, char **js);
char *stJson_token_tostr(char *js, jsmntok_t *token);
int64_t stJson_parseInt(char *js, jsmntok_t *tokens, int64_t tokenIndex);
double stJson_parseFloat(char *js, jsmntok_t *tokens, int64_t tokenIndex);
bool stJson_parseBool(char *js, jsmntok_t *tokens, int64_t tokenIndex);
int64_t stJson_parseFloatArray(double *toArray, int64_t arrayLength, char *js,
                               jsmntok_t *tokens, int64_t tokenIndex);

#ifdef __cplusplus
}
#endif

#endif
