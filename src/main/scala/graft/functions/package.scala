package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftx.Bridge

/** Column-facing API for graft's native Catalyst expressions. */
package object functions {

  /** Codegen dot product of two numeric array columns (see
    * [[graft.functions.ArrayDotProduct]]).
    */
  def arrayDot(a: Column, b: Column): Column =
    Bridge.column(ArrayDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Codegen MinHash signature of a string-array column (see
    * [[graft.functions.MinHashSignature]]).
    */
  def minhash(sh: Column, numPerms: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(sh), numPerms))

  /** Winnowing-style min rolling hash of a string column (see
    * [[graft.functions.RollingHashMin]]).
    */
  def rollingMin(text: Column, k: Int): Column =
    Bridge.column(RollingHashMin(Bridge.expression(text), k))

  /** Distinct n-token shingles of a string column in one native pass
    * (see [[graft.functions.TokenShingles]]).
    */
  def tokenShingles(text: Column, n: Int): Column =
    Bridge.column(TokenShingles(Bridge.expression(text), n))

  /** 64-bit SimHash of a token-array column (see
    * [[graft.functions.SimHash64]]).
    */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** 60-bit md5-based SimHash with an exact SQL twin (see
    * [[graft.functions.Simhash60Md5]]).
    */
  def simhash60md5(tokens: Column): Column =
    Bridge.column(Simhash60Md5(Bridge.expression(tokens)))

  /** md5-window winnowing fingerprint with an exact SQL twin (see
    * [[graft.functions.Md5WinnowMin]]).
    */
  def md5WinnowMin(text: Column, k: Int): Column =
    Bridge.column(Md5WinnowMin(Bridge.expression(text), k))

  /** Content-defined chunk cut positions with an exact SQL twin (see
    * [[graft.functions.Md5WindowCuts]]).
    */
  def md5WindowCuts(text: Column, k: Int, maskBits: Int): Column =
    Bridge.column(Md5WindowCuts(Bridge.expression(text), k, maskBits))

  /** Z-order interleave of an `array<bigint>` of bucket ids (see
    * [[graft.functions.ZOrderInterleave]]).
    */
  def zorderInterleave(buckets: Column, bits: Int): Column =
    Bridge.column(ZOrderInterleave(Bridge.expression(buckets), bits))

  /** All sign-LSH band hashes of a unit-vector column in one native
    * pass (see [[graft.functions.HyperplaneBands]]).
    */
  def hyperplaneBands(
      unit: Column,
      planes: Array[Array[Double]],
      nBands: Int,
      bitsPerBand: Int): Column =
    Bridge.column(HyperplaneBands(Bridge.expression(unit), planes,
      nBands, bitsPerBand))
}
