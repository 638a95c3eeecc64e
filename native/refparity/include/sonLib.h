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

void *stList_peek(stList *l);
stList *stList_copy(stList *l, void (*destructFn)(void *));
stList *stList_filter2(stList *l, bool (*fn)(void *, void *), void *extraArg);
void stList_mapReplace(stList *l, void *(*fn)(void *, void *), void *extraArg);

/* ---- int tuples ---- */
typedef struct _stIntTuple {
    int64_t length;
    int64_t vals[];
} stIntTuple;

stIntTuple *stIntTuple_construct1(int64_t a);
stIntTuple *stIntTuple_construct2(int64_t a, int64_t b);
stIntTuple *stIntTuple_construct3(int64_t a, int64_t b, int64_t c);
stIntTuple *stIntTuple_construct4(int64_t a, int64_t b, int64_t c, int64_t d);
stIntTuple *stIntTuple_construct5(int64_t a, int64_t b, int64_t c, int64_t d,
                                  int64_t e);
int64_t stIntTuple_get(stIntTuple *t, int64_t i);
int64_t stIntTuple_getPosition(stIntTuple *t, int64_t i);
int64_t stIntTuple_length(stIntTuple *t);
void stIntTuple_destruct(stIntTuple *t);
int stIntTuple_cmpFn(stIntTuple *a, stIntTuple *b);

/* ---- sorted set (array-backed; fine at anchor-list scale) ----
 * Iterator semantics mirror sonLib's libavl traverser: a fresh iterator
 * sits at the null position; getNext ascends from the smallest item,
 * getPrevious descends from the largest (multipleAligner.c:393 relies
 * on descending iteration straight after getIterator). */
typedef struct _stSortedSet stSortedSet;
typedef struct _stSortedSetIterator stSortedSetIterator;
stSortedSet *stSortedSet_construct3(int (*cmp)(const void *, const void *),
                                    void (*destructFn)(void *));
void stSortedSet_setDestructor(stSortedSet *s, void (*destructFn)(void *));
void stSortedSet_insert(stSortedSet *s, void *v);
void *stSortedSet_search(stSortedSet *s, void *v);
void *stSortedSet_searchLessThan(stSortedSet *s, void *v);
void *stSortedSet_searchGreaterThan(stSortedSet *s, void *v);
void *stSortedSet_searchGreaterThanOrEqual(stSortedSet *s, void *v);
void stSortedSet_remove(stSortedSet *s, void *v);
int64_t stSortedSet_size(stSortedSet *s);
void *stSortedSet_getFirst(stSortedSet *s);
void *stSortedSet_getLast(stSortedSet *s);
stSortedSetIterator *stSortedSet_getIterator(stSortedSet *s);
void *stSortedSet_getNext(stSortedSetIterator *it);
void *stSortedSet_getPrevious(stSortedSetIterator *it);
void stSortedSet_destructIterator(stSortedSetIterator *it);
void stSortedSet_destruct(stSortedSet *s);
stSortedSet *stList_getSortedSet(stList *l,
                                 int (*cmp)(const void *, const void *));

/* ---- hash map (chained buckets; default = pointer keys) ---- */
typedef struct _stHash stHash;
typedef struct _stHashIterator stHashIterator;
stHash *stHash_construct2(void (*destructKeys)(void *),
                          void (*destructValues)(void *));
stHash *stHash_construct3(uint64_t (*hashFn)(const void *),
                          int (*equalsFn)(const void *, const void *),
                          void (*destructKeys)(void *),
                          void (*destructValues)(void *));
void stHash_insert(stHash *h, void *key, void *value);
void *stHash_search(stHash *h, void *key);
void *stHash_remove(stHash *h, void *key);
void *stHash_removeAndFreeKey(stHash *h, void *key);
stHashIterator *stHash_getIterator(stHash *h);
void *stHash_getNext(stHashIterator *it);
void stHash_destructIterator(stHashIterator *it);
void stHash_destruct(stHash *h);
uint64_t stHash_stringKey(const void *k);
int stHash_stringEqualKey(const void *key1, const void *key2);

/* ---- hash set (same machinery, element-keyed) ---- */
typedef struct _stSet stSet;
typedef struct _stSetIterator stSetIterator;
stSet *stSet_construct3(uint64_t (*hashFn)(const void *),
                        int (*equalsFn)(const void *, const void *),
                        void (*destructFn)(void *));
void stSet_insert(stSet *s, void *v);
void *stSet_search(stSet *s, void *v);
void *stSet_remove(stSet *s, void *v);
stSetIterator *stSet_getIterator(stSet *s);
void *stSet_getNext(stSetIterator *it);
void stSet_destructIterator(stSetIterator *it);
void stSet_destruct(stSet *s);

/* ---- strings ---- */
char *stString_copy(const char *s);
char *stString_reverseComplementString(const char *s);
bool stString_eq(const char *s1, const char *s2);
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
void st_setLogLevelFromString(const char *logLevelString);
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
